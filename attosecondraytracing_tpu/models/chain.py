"""OpticalChain: the scene — a source bundle plus successive optical elements
(ART/ModuleOpticalChain.py), with hash-gated retracing, source/element
misalignment methods, and scan ("loop list") generators.

The trace itself is the jitted batched engine
(:func:`attosecondraytracing_tpu.ops.trace.trace`); chains with the same
*structure* (same element types) reuse the same XLA executable, so parameter
scans don't recompile.
"""

from __future__ import annotations

import copy
import os
import sys
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import host_geometry as hg
from ..ops.bundle import RayBundle
from ..ops.trace import trace
from . import sources as msource


class FusedSourceInfo(NamedTuple):
    """Host-side description of a source that the fused Pallas kernels can
    synthesize in-kernel (ops.pallas_trace.BakedSource inputs + the Gaussian
    intensity edge). Attached to an OpticalChain by OEPlacement; kept in sync
    by shift_source/tilt_source; cleared when the user replaces the bundle."""

    kind: str            # 'cone' (point source) | 'disk' (plane-wave disk) | 'extended' | 'square' (plane-wave grid)
    origin: tuple        # lab-frame source point / disk centre
    axis: tuple          # beam axis (unit)
    param: float         # half-divergence [rad] for 'cone'/'extended', radius [mm] for 'disk', side length [mm] for 'square'
    gaussian_edge: float | None  # ApplyGaussianIntensityToRayList edge value
    n_rays: int
    wavelength: float
    diameter: float = 0.0  # source-disk diameter [mm] ('extended' only)

    def baked(self):
        from ..ops.pallas_trace import make_source_spec

        return make_source_spec(self.kind, np.asarray(self.origin),
                                np.asarray(self.axis), self.param,
                                diameter=self.diameter, n_rays=self.n_rays)


#: bundles below this size stay on the XLA path under engine="auto": the
#: Pallas kernels bake chain geometry as compile-time constants, so every
#: distinct chain costs a fresh Mosaic compile — worth it for production-size
#: bundles, pure overhead for the reference-default 1000 rays.
PALLAS_MIN_RAYS = int(os.environ.get("ART_TPU_PALLAS_MIN_RAYS", "200000"))


#: packed jitted trace (one flat element transfer, executable shared across
#: same-structure chains) — implementation moved to ops.trace.trace_jit
from ..ops.trace import trace_jit as _traced  # noqa: E402


def _bundle_hash(bundle: RayBundle) -> int:
    parts = []
    for leaf in bundle:
        arr = np.asarray(leaf)
        parts.append(hash(arr.tobytes()))
    return hash(tuple(parts))


class OpticalChain:
    """Source rays + optical elements + description (+ scan metadata)."""

    def __init__(
        self,
        source_rays: RayBundle,
        optical_elements: list,
        description: str = "",
        loop_variable_name: str | None = None,
        loop_variable_value: float | None = None,
        source_spec: FusedSourceInfo | None = None,
    ):
        # deepcopy so later mutation of the caller's objects does not change
        # this chain (reference does the same, ART/ModuleOpticalChain.py:118-120)
        self._source_spec = None
        self.source_rays = source_rays
        self._source_spec = source_spec
        self.optical_elements = copy.deepcopy(list(optical_elements))
        self.description = description
        self.loop_variable_name = loop_variable_name
        self.loop_variable_value = loop_variable_value
        self._output_rays = None
        self._last_source_hash = None
        self._last_elements_hash = None
        #: engine used by the most recent trace_final call:
        #: "xla" | "pallas" | "pallas-source" (None before the first trace)
        self.last_trace_engine = None

    # ------------------------------------------------------------------
    @property
    def source_rays(self) -> RayBundle:
        return self._source_rays

    @source_rays.setter
    def source_rays(self, bundle: RayBundle):
        # a user-supplied bundle invalidates the fused-source description —
        # internal mutations that preserve it go through _set_source instead
        self._source_rays = bundle
        self._source_spec = None

    def _set_source(self, bundle: RayBundle, spec: FusedSourceInfo | None):
        self._source_rays = bundle
        self._source_spec = spec

    @property
    def source_spec(self) -> FusedSourceInfo | None:
        """Fused-source description when the current source bundle is known to
        be an in-kernel-synthesizable Vogel source (None otherwise)."""
        return self._source_spec

    def resize_source(self, n_rays: int) -> None:
        """Regenerate the source bundle at a different ray count from the
        chain's fused-source description (same kind, origin, axis,
        divergence/radius, wavelength, and Gaussian profile) — e.g. to
        production-scale an example config from the CLI (``--rays``).
        Only available while ``source_spec`` is set (factory Vogel sources);
        raises ValueError for user-supplied bundles."""
        from . import sources as msource

        spec = self._source_spec
        if spec is None:
            raise ValueError(
                "resize_source needs a synthesizable source (source_spec is "
                "None — the bundle was user-supplied or already consumed)"
            )
        n_rays = int(n_rays)
        origin = np.asarray(spec.origin, dtype=float)
        axis = np.asarray(spec.axis, dtype=float)
        if spec.kind == "cone":
            bundle = msource.PointSource(origin, axis, spec.param, n_rays,
                                         Wavelength=spec.wavelength)
        elif spec.kind == "extended":
            bundle = msource.ExtendedSource(origin, axis, spec.diameter,
                                            spec.param, n_rays,
                                            Wavelength=spec.wavelength)
        elif spec.kind == "square":
            bundle = msource.PlaneWaveSquare(origin, axis, spec.param, n_rays,
                                             Wavelength=spec.wavelength)
        else:
            bundle = msource.PlaneWaveDisk(origin, axis, spec.param, n_rays,
                                           Wavelength=spec.wavelength)
        if spec.gaussian_edge is not None:
            bundle = msource.ApplyGaussianIntensityToRayList(
                bundle, spec.gaussian_edge)
        # 'extended' emits n_sources * n_each rays, not the requested count
        self._set_source(bundle, spec._replace(n_rays=bundle.n_rays))
        self._output_rays = None  # retrace on next use

    # ------------------------------------------------------------------
    def copy_chain(self) -> "OpticalChain":
        return OpticalChain(self.source_rays, self.optical_elements, self.description,
                            source_spec=self._source_spec)

    def device_elements(self):
        return [e.to_device() for e in self.optical_elements]

    def get_output_rays(self, ignore_defects: bool = True, force: bool = False):
        """List of bundles *after* each element; recomputed only when source
        or elements changed (hash-gated like ART/ModuleOpticalChain.py:183-202)."""
        src_hash = _bundle_hash(self.source_rays)
        el_hash = hash(tuple(hash(e) for e in self.optical_elements))
        if force or src_hash != self._last_source_hash or el_hash != self._last_elements_hash:
            self._output_rays = _traced(
                self.source_rays, self.device_elements(), ignore_defects, True
            )
            self._last_source_hash = src_hash
            self._last_elements_hash = el_hash
        return self._output_rays

    def _pallas_eligible(self, elements) -> bool:
        """True when the fused Pallas kernel can trace this chain: a non-CPU
        backend (CPU only has the slow interpreter) and no *grid* defect maps
        (Fourrier/MeasuredMap interpolation needs gathers the kernel does not
        do; Zernike defects evaluate in-kernel — see ops/pallas_trace.py)."""
        from ..ops.defects import ZernikeDefect
        from ..ops.trace import MirrorElement

        if jax.default_backend() == "cpu":
            return False
        return all(
            all(isinstance(d, ZernikeDefect) for d in el.defects)
            for el in elements
            if isinstance(el, MirrorElement)
        )

    def trace_final(self, ignore_defects: bool = True, engine: str | None = None) -> RayBundle:
        """Only the bundle after the last element (no history buffers — the
        production path for statistics, detector optimization and benchmarks).

        ``engine``: "auto" (default; override with ART_TPU_ENGINE) routes
        production-size bundles (>= PALLAS_MIN_RAYS rays) through the fused
        Pallas whole-chain kernel on TPU — the in-kernel-source variant when
        the chain's source is a factory Vogel source (``source_spec``), the
        streamed variant otherwise — with transparent fallback to the XLA
        trace; chains the Mosaic kernel cannot take (grid defect maps) but
        whose source is synthesizable route to the XLA fused-source engine
        (in-jit source + chained frames, ops/xla_source.py) at production
        sizes; "pallas" forces the fused kernel (raises if unsupported);
        "xla-source" forces the XLA fused-source engine; "xla" forces the
        reference-parity streamed XLA path. The engine actually used is
        recorded in ``self.last_trace_engine``.
        """
        engine = engine or os.environ.get("ART_TPU_ENGINE", "auto")
        if engine not in ("auto", "pallas", "xla", "xla-source"):
            raise ValueError(
                'engine must be one of "auto", "pallas", "xla", "xla-source"')
        elements = self.device_elements()
        n_rays = self.source_rays.n_rays
        want_pallas = engine == "pallas" or (
            engine == "auto"
            and n_rays >= PALLAS_MIN_RAYS
            and self._pallas_eligible(elements)
        )
        if want_pallas and engine == "auto":
            # cold-process warmup weighing (VERDICT r3 #6): the first Pallas
            # kernel of a process pays minutes of Mosaic warmup on this TPU;
            # for a small one-shot trace the XLA path (itself >1e9 rays/s)
            # finishes long before the warmup would
            from ..ops import warmup

            if (jax.default_backend() != "cpu" and not warmup.mosaic_warm()
                    and n_rays < warmup.BREAKEVEN_RAYS):
                print(
                    f"[attosecondraytracing_tpu] staying on the XLA engine for "
                    f"this {n_rays}-ray trace: the one-time Mosaic warmup "
                    f"(minutes) exceeds the XLA cost at this size. Force with "
                    f"ART_TPU_ENGINE=pallas or ART_TPU_ASSUME_WARM=1.",
                    file=sys.stderr,
                    flush=True,
                )
                want_pallas = False
        if want_pallas:
            try:
                out = self._trace_final_pallas(elements, ignore_defects)
                return out
            except Exception as exc:
                if engine == "pallas":
                    raise
                print(
                    f"[attosecondraytracing_tpu] fused Pallas trace unavailable "
                    f"({type(exc).__name__}: {exc}); falling back to the XLA path.",
                    file=sys.stderr,
                    flush=True,
                )
        spec = self._source_spec
        want_xla_source = engine == "xla-source" or (
            engine == "auto"
            and not want_pallas
            and spec is not None
            and spec.kind in ("cone", "disk", "extended", "square")
            and n_rays >= PALLAS_MIN_RAYS
            and jax.default_backend() != "cpu"
        )
        if want_xla_source:
            try:
                from ..ops.xla_source import xla_trace_source

                out = xla_trace_source(
                    spec.baked(), elements, spec.n_rays,
                    wavelength=spec.wavelength, ignore_defects=ignore_defects,
                )
                out = out._replace(intensity=jnp.asarray(self.source_rays.intensity))
                self.last_trace_engine = "xla-source"
                return out
            except Exception as exc:
                if engine == "xla-source":
                    raise
                print(
                    f"[attosecondraytracing_tpu] XLA fused-source trace "
                    f"unavailable ({type(exc).__name__}: {exc}); falling back "
                    f"to the streamed XLA path.",
                    file=sys.stderr,
                    flush=True,
                )
        self.last_trace_engine = "xla"
        return _traced(self.source_rays, elements, ignore_defects, False)

    def _trace_final_pallas(self, elements, ignore_defects: bool = True) -> RayBundle:
        from ..ops import pallas_trace as pt

        spec = self._source_spec
        if spec is not None and spec.kind in ("cone", "disk", "extended", "square"):
            out = pt.pallas_trace_source(
                spec.baked(), elements, spec.n_rays, wavelength=spec.wavelength,
                ignore_defects=ignore_defects,
            )
            # ray i of the kernel's in-kernel spiral is ray i of the factory
            # bundle, so the source intensity profile rides along by index
            out = out._replace(intensity=jnp.asarray(self.source_rays.intensity))
            self.last_trace_engine = "pallas-source"
            return out
        out = pt.pallas_trace(self.source_rays, elements, ignore_defects=ignore_defects)
        self.last_trace_engine = "pallas"
        return out

    # ------------------------------------------------------------------
    # visualization
    def render(self, **kwargs):
        """3D rendering of elements and rays (ART/ModuleOpticalChain.py:204-215)."""
        from ..analysis.plots import RayRenderGraph

        kwargs.setdefault("maxRays", 300)
        kwargs.setdefault("OEpoints", 3000)
        return RayRenderGraph(self, None, **kwargs)

    def quickshow(self, **kwargs):
        """Quick 3D look at the chain (documented but unimplemented in the
        reference, ART/ModuleOpticalChain.py:41)."""
        return self.render(maxRays=100, OEpoints=1000, **kwargs)

    # ------------------------------------------------------------------
    # source misalignment (ART/ModuleOpticalChain.py:219-369)

    def _first_incidence_plane_normal(self):
        central = np.asarray(self.source_rays.d, dtype=float).mean(axis=0)
        central /= np.linalg.norm(central)
        from .masks import Mask

        for el in self.optical_elements:
            if isinstance(el.type, Mask):
                continue
            if np.linalg.norm(np.cross(central, el.normal)) > 1e-10:
                return central, el.normal
        raise Exception(
            "There doesn't seem to be a non-normal-incidence mirror in this optical chain, "
            "so you should rather give 'axis' as a numpy-array of length 3."
        )

    def shift_source(self, axis, distance: float):
        """Shift the source bundle by ``distance`` mm along ``axis``:
        a lab vector or one of "vert"/"horiz"/"random" relative to the first
        non-normal-incidence mirror's incidence plane
        (ART/ModuleOpticalChain.py:219-292)."""
        if isinstance(axis, np.ndarray) and len(axis) == 3:
            translation = axis
        else:
            central, oe_normal = self._first_incidence_plane_normal()
            perp = np.cross(central, oe_normal)
            horiz = np.cross(perp, central)
            if axis == "vert":
                translation = perp
            elif axis == "horiz":
                translation = horiz
            elif axis == "random":
                translation = np.random.uniform(-1, 1) * perp + np.random.uniform(-1, 1) * horiz
            else:
                raise ValueError('The shift direction must be one of ["vert", "horiz", "random"].')
        shift = distance * hg.normalize(translation)
        spec = self._source_spec
        if spec is not None:  # a rigid shift keeps the source fused-traceable
            spec = spec._replace(origin=tuple(np.asarray(spec.origin) + shift))
        self._set_source(
            self.source_rays._replace(p=np.asarray(self.source_rays.p) + shift), spec
        )

    def tilt_source(self, axis, angle: float):
        """Rotate source directions by ``angle`` deg about an axis: a lab
        vector or "in_plane"/"out_plane"/"random"
        (ART/ModuleOpticalChain.py:294-369)."""
        if isinstance(axis, np.ndarray) and len(axis) == 3:
            rot_axis = axis
        else:
            central, oe_normal = self._first_incidence_plane_normal()
            ax_in = np.cross(central, oe_normal)
            ax_out = np.cross(ax_in, central)
            if axis == "in_plane":
                rot_axis = ax_in
            elif axis == "out_plane":
                rot_axis = ax_out
            elif axis == "random":
                rot_axis = np.random.uniform(-1, 1) * ax_in + np.random.uniform(-1, 1) * ax_out
            else:
                raise ValueError(
                    'The tilt axis must be one of ["in_plane", "out_plane", "random"] or a 3-vector.'
                )
        R = hg.rotation_around_axis(rot_axis, np.deg2rad(angle))
        spec = self._source_spec
        if spec is not None and spec.kind == "cone":
            # a point-source tilt is exactly a rotated cone axis (the spiral
            # rolls about the new axis, but every per-ray radius — and hence
            # the intensity profile and all statistics — is unchanged)
            spec = spec._replace(axis=tuple(R @ np.asarray(spec.axis)))
        else:
            # a tilted plane wave leaves its points on the old disk plane —
            # not a fused disk source any more
            spec = None
        self._set_source(
            self.source_rays._replace(d=np.asarray(self.source_rays.d) @ R.T), spec
        )

    def get_source_loop_list(self, axis: str, loop_variable_values):
        """List of chains with the source tilted/shifted/refocused over the
        given values (ART/ModuleOpticalChain.py:371-446)."""
        names = {
            "tilt_in_plane": "source tilt in-plane (deg)",
            "tilt_out_plane": "source tilt out-of-plane (deg)",
            "tilt_random": "source tilt random axis (deg)",
            "shift_vert": "source shift vertical (mm)",
            "shift_horiz": "source shift horizontal (mm)",
            "shift_random": "source shift random-direction (mm)",
            "divergence": "point-source divergence half-angle (rad)",
        }
        if axis not in names:
            raise ValueError(f"axis must be one of {sorted(names)}")
        chains = []
        for x in loop_variable_values:
            mod = self.copy_chain()
            mod.loop_variable_name = names[axis]
            mod.loop_variable_value = float(x)
            if axis.startswith("tilt"):
                mod.tilt_source(axis[5:], float(x))
            elif axis.startswith("shift"):
                mod.shift_source(axis[6:], float(x))
            else:  # divergence: rebuild a point source with the same axis
                pts = np.asarray(self.source_rays.p)
                if not np.allclose(pts, pts[0], atol=1e-12):
                    raise ValueError(
                        "get_source_loop_list('divergence', ...) requires a point "
                        "source (all rays sharing one origin). This chain's source "
                        "has extended/plane-wave origins, so rebuilding it from ray 0 "
                        "would silently change the scene; build the scan from a fresh "
                        "PointSource instead."
                    )
                p0 = pts[0]
                d0 = np.asarray(self.source_rays.d)[0]
                edge_int = float(np.asarray(self.source_rays.intensity)[-1])
                src = msource.PointSource(
                    p0, d0, float(x), self.source_rays.n_rays, float(self.source_rays.wavelength)
                )
                src_axis = np.asarray(d0, dtype=float)  # spiral ray 0 IS the axis
                mod._set_source(
                    msource.ApplyGaussianIntensityToRayList(src, edge_int),
                    FusedSourceInfo(
                        kind="cone", origin=tuple(np.asarray(p0, float)),
                        axis=tuple(src_axis / np.linalg.norm(src_axis)),
                        param=float(x), gaussian_edge=edge_int,
                        n_rays=self.source_rays.n_rays,
                        wavelength=float(self.source_rays.wavelength),
                    ),
                )
            chains.append(mod)
        return chains

    # ------------------------------------------------------------------
    # element misalignment (ART/ModuleOpticalChain.py:449-657)

    def rotate_OE(self, OEindx: int, axis: str, angle: float):
        el = self.optical_elements[OEindx]
        if axis == "pitch":
            el.rotate_pitch_by(angle)
        elif axis == "roll":
            el.rotate_roll_by(angle)
        elif axis == "yaw":
            el.rotate_yaw_by(angle)
        elif axis in ("random", "rotate_random"):
            el.rotate_random_by(angle)
        else:
            raise ValueError('axis must be one of ["pitch", "roll", "yaw", "random"].')

    def shift_OE(self, OEindx: int, axis: str, distance: float):
        el = self.optical_elements[OEindx]
        if axis == "normal":
            el.shift_along_normal(distance)
        elif axis == "major":
            el.shift_along_major(distance)
        elif axis == "cross":
            el.shift_along_cross(distance)
        elif axis == "random":
            el.shift_along_random(distance)
        else:
            raise ValueError('axis must be one of ["normal", "major", "cross", "random"].')

    def get_OE_loop_list(self, OEindx: int, axis: str, loop_variable_values):
        """List of chains stepping one degree of freedom of one element
        (ART/ModuleOpticalChain.py:533-614)."""
        oe_name = self.optical_elements[OEindx].type.type + "_idx_" + str(OEindx)
        names = {
            "pitch": oe_name + " pitch rotation (deg)",
            "roll": oe_name + " roll rotation (deg)",
            "yaw": oe_name + " yaw rotation (deg)",
            "rotate_random": oe_name + " random rotation (deg)",
            "shift_normal": oe_name + " shift along normal axis (mm)",
            "shift_major": oe_name + " shift along major axis (mm)",
            "shift_cross": oe_name + " shift along (normal x major)-direction (mm)",
            "shift_random": oe_name + " shift along random axis (mm)",
        }
        if axis not in names:
            raise ValueError(f"axis must be one of {sorted(names)}")
        chains = []
        for x in loop_variable_values:
            mod = self.copy_chain()
            mod.loop_variable_name = names[axis]
            mod.loop_variable_value = float(x)
            if axis in ("pitch", "roll", "yaw", "rotate_random"):
                mod.rotate_OE(OEindx, axis, float(x))
            else:
                mod.shift_OE(OEindx, axis[6:], float(x))
            chains.append(mod)
        return chains

    def get_OE_random_loop_list(self, rotate_std: float, shift_std: float, number_sims: int, rng=None):
        """Monte-Carlo tolerancing: every element randomly rotated and shifted
        with normal-distributed amplitudes (ART/ModuleOpticalChain.py:616-657)."""
        rng = np.random if rng is None else rng
        # loop label ends up in saved results/plots; wording is ours (the
        # reference's label at ART/ModuleOpticalChain.py:641 differs slightly)
        name = (
            "all optical elements randomly rotated with std=" + str(rotate_std)
            + " deg and shifted with std=" + str(shift_std) + " mm"
        )
        chains = []
        for i in range(number_sims):
            mod = self.copy_chain()
            mod.loop_variable_name = name
            mod.loop_variable_value = i
            for j in range(len(self.optical_elements)):
                mod.rotate_OE(j, "random", rng.normal(loc=0, scale=rotate_std))
                mod.shift_OE(j, "random", rng.normal(loc=0, scale=shift_std))
            chains.append(mod)
        return chains
