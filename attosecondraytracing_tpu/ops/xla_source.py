"""XLA fused-source engine: the Pallas kernels' semantics for chains the
Mosaic kernel cannot take — grid-interpolated defect maps (VERDICT r3 #3).

The reference traces DeformedMirrors of every defect type in its one hot
loop (ART/ModuleMirror.py:945-981, ART/ModuleDefects.py:34-146). Here the
Pallas kernels exclude Fourrier/MeasuredMap grids (bilinear lookup needs
per-lane gathers Mosaic does not lower), so round 3 dropped such chains to
the generic streamed XLA trace: host-built source bundle, two rotations per
element, per-distance detector loops.

This module closes most of that gap inside XLA, which lowers gathers fine:

* the source is synthesized IN-JIT from the ray index (same exact-float
  Vogel formulas as the kernel, ops/pallas_trace._vogel_xy_c) — no host
  bundle, no 37 B/ray read;
* the chain runs in chained-frame mode with folded premasks
  (ops/trace.run_chain_chained) — one affine per element, grid defects
  interpolated with XLA gathers from an HBM-resident (and typically
  cached) ~1 MB map;
* :func:`xla_source_moments` fuses the detector MOMENT epilogue
  (ops/pallas_trace.moment_rows) into the same jit, so defect-bearing
  chains get the one-pass J-independent detector optimizer too.

Geometry (maps, poses, defect grids) enters as *traced inputs*, not baked
constants — pose changes and parameter scans reuse the compiled executable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import pallas_trace as pt
from .bundle import RayBundle
from .trace import compose_chain, fold_premasks, run_chain_chained


def _source_inputs(spec: pt.BakedSource, elements):
    """(folded elements, maps, final, premasks) with the source frame folded
    into map 0 — float64 host math, returned as plain arrays (jit inputs)."""
    maps, final = compose_chain(elements)
    M0, _ = maps[0]
    R0 = np.asarray(M0, dtype=np.float64)
    Rs = np.asarray(spec.rot, dtype=np.float64)
    el0 = elements[0]
    pos0 = np.asarray(el0.position, dtype=np.float64)
    from .trace import MirrorElement

    cen0 = (np.asarray(el0.centre, dtype=np.float64)
            if isinstance(el0, MirrorElement) else np.zeros(3))
    M = R0 @ Rs
    b = R0 @ (np.asarray(spec.origin, dtype=np.float64) - pos0) + cen0
    maps = [(M, b)] + list(maps[1:])
    elements, maps, premasks = fold_premasks(elements, maps)
    f32 = lambda a: np.asarray(a, np.float32)
    maps = tuple((f32(M_), f32(b_)) for M_, b_ in maps)
    final = tuple(f32(v) for v in final)
    premasks = tuple(
        tuple((sup_, f32(Mm), f32(bb)) for (sup_, Mm, bb) in pre)
        for pre in premasks
    )
    return tuple(elements), maps, final, premasks


@partial(jax.jit, static_argnames=("kind", "n_rays", "n_total", "n_each",
                                   "n_sources", "ignore_defects",
                                   "want_moments"))
def _xla_source_run(elements, maps, final, premasks, det, kind, radius,
                    phase, k_frac, wcoef, centre_distance, pos_radius,
                    n_rays, n_total, n_each, n_sources, ignore_defects,
                    want_moments):
    """Synthesize + trace (+ optionally reduce to moments) in one jit."""
    from .trace import TraceState

    kf = jnp.arange(n_rays, dtype=jnp.float32)
    (px, py, pz), (dx, dy, dz), rr = pt.synth_source_c(
        kind, kf, n_total, radius, phase, k_frac, pos_radius=pos_radius,
        n_each=n_each, n_sources=n_sources)
    zeros = jnp.zeros((n_rays,), jnp.float32)
    s = TraceState(
        px=px + zeros, py=py + zeros, pz=pz + zeros,
        dx=dx + zeros, dy=dy + zeros, dz=dz + zeros,
        opl=zeros, opl_c=zeros,
        alive=jnp.ones((n_rays,), bool),
        incidence=zeros,
    )
    if not want_moments:
        # same unfrozen dead-ray convention as the Pallas bundle kernels
        # (consumers mask by alive; keeps the two engines bit-similar)
        return run_chain_chained(s, elements, maps, final,
                                 ignore_defects=ignore_defects,
                                 premasks=premasks, freeze_dead=False)
    # moments: stay in the LAST element's patch-relative frame — the baked
    # detector plane lives there (pt.bake_detector / run_chain_chained's
    # output convention), exactly like the Pallas moment kernels
    from .trace import chained_step

    for el, (M, b), pre in zip(elements, maps, premasks):
        # moments epilogue masks dead rays: skip their freeze selects
        s = chained_step(el, M, b, s, want_incidence=False,
                         ignore_defects=ignore_defects, premasks=pre,
                         freeze_dead=False)
    weights = jnp.exp(wcoef * rr)  # edge**rr, the normalized radial law
    rows = pt.moment_rows(s, det, weights, centre_distance=centre_distance)
    return rows[0]  # (LANES,) — row 0 carries the 16 sums


def xla_trace_source(
    spec: pt.BakedSource,
    elements,
    n_rays: int,
    wavelength=50e-6,
    phase=0.0,
    k_frac=0.0,
    n_total: int | None = None,
    ignore_defects: bool = True,
) -> RayBundle:
    """Trace ``n_rays`` of the in-jit-synthesized Vogel source through the
    chain (chained frames + folded premasks) — pallas_trace_source semantics
    on the XLA path, defects of every kind supported."""
    if n_rays >= 1 << 24:
        raise ValueError("per-call ray count must stay < 2^24 (float index "
                         "exactness); chunk larger ranges")
    els, maps, final, premasks = _source_inputs(spec, elements)
    dummy_det = pt.BakedDetector(
        centre=(0.0, 0.0, 0.0), normal=(0.0, 0.0, 1.0),
        e1=(1.0, 0.0, 0.0), e2=(0.0, 1.0, 0.0), distances=(0.0,),
        opl_ref=0.0, delay_offsets=(0.0,),
    )
    s = _xla_source_run(
        els, maps, final, premasks, dummy_det, spec.kind,
        jnp.float32(spec.radius), jnp.float32(phase), jnp.float32(k_frac),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(spec.pos_radius),
        n_rays, n_total or n_rays, spec.n_each, spec.n_sources,
        ignore_defects, False,
    )
    zeros = jnp.zeros((n_rays,), jnp.float32)
    return RayBundle(
        p=jnp.stack([s.px, s.py, s.pz], axis=-1),
        d=jnp.stack([s.dx, s.dy, s.dz], axis=-1),
        opl=s.opl, opl_c=s.opl_c, alive=s.alive,
        intensity=jnp.ones((n_rays,), jnp.float32),
        incidence=s.incidence,
        wavelength=jnp.asarray(wavelength, jnp.float32),
    )


def _device_inputs(spec: pt.BakedSource, elements):
    """:func:`_source_inputs` with ndarray leaves device_put ONCE — the
    geometry and the (possibly ~10-100 MB) defect grids are jit *arguments*
    of the engine, and re-passing host NumPy would re-upload them through
    the (slow) tunnel on every dispatch. Python-scalar leaves stay as-is to
    keep their weak dtypes."""
    import jax

    return jax.tree.map(
        lambda x: jax.device_put(x) if isinstance(x, np.ndarray) else x,
        _source_inputs(spec, elements))


def xla_source_moments(
    spec: pt.BakedSource,
    elements,
    n_rays: int,
    det_centre,
    det_normal,
    det_rot,
    opl_ref: float | None = None,
    gaussian_edge: float | None = None,
    centre_distance: float = 0.0,
    ignore_defects: bool = True,
    inputs=None,
):
    """The 16 distance-independent detector moments through the XLA
    fused-source engine — same contract as
    pt.pallas_source_detector_moments, grid defects included. Chunked
    beyond 2^23 rays with the (phase, k_frac) law. ``inputs`` (from
    :func:`_device_inputs`) reuses device-resident geometry across calls."""
    centre_distance = float(np.float32(centre_distance))
    opl_ref, _offsets, inv_dn_chief = pt.chief_ray_refs(
        spec, elements, det_centre, det_normal, (0.0,), opl_ref)
    det = pt.bake_detector(elements, det_centre, det_normal, det_rot,
                           opl_ref=opl_ref, inv_dn_chief=inv_dn_chief)
    els, maps, final, premasks = (inputs if inputs is not None
                                  else _device_inputs(spec, elements))
    # weight = edge**rr, rr the normalized radial law (synth_source_c)
    wcoef = 0.0 if gaussian_edge is None else float(np.log(gaussian_edge))

    CHUNK = 1 << 23
    moments = np.zeros(pt.LANES, np.float64)
    n_total = n_rays
    for n_local, phase_i, k_frac_i in pt.source_chunks(
            spec.kind, n_rays, n_total, spec.n_each, spec.n_sources, CHUNK):
        row = _xla_source_run(
            els, maps, final, premasks, det, spec.kind,
            jnp.float32(spec.radius), jnp.float32(phase_i),
            jnp.float32(k_frac_i), jnp.float32(wcoef),
            jnp.float32(centre_distance), jnp.float32(spec.pos_radius),
            n_local, n_total, spec.n_each, spec.n_sources,
            ignore_defects, True,
        )
        moments += np.asarray(row, np.float64)
    return {
        "moments": moments[: len(pt.MOMENT_FIELDS)],
        "opl_ref": opl_ref,
        "inv_dn_chief": inv_dn_chief,
        "centre_distance": centre_distance,
    }


def make_xla_moments_fn(spec: pt.BakedSource, elements, n_rays: int,
                        ignore_defects: bool = True):
    """moments_fn for analysis.optimizer.FindOptimalDistancePallas backed by
    the XLA fused-source engine — the defect-capable twin of
    ops/pallas_scan.make_moments_fn. Geometry + defect grids are uploaded
    once (``_device_inputs``) and reused by every optimizer call."""
    inputs = _device_inputs(spec, elements)

    def moments_fn(det_centre, det_normal, det_rot, gaussian_edge=None,
                   centre_distance=0.0):
        return xla_source_moments(
            spec, elements, n_rays, det_centre, det_normal, det_rot,
            gaussian_edge=gaussian_edge, centre_distance=centre_distance,
            ignore_defects=ignore_defects, inputs=inputs,
        )

    return moments_fn
