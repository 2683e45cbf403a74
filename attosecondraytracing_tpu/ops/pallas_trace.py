"""Fused Pallas TPU kernel for the whole-chain trace.

One kernel traces a tile of rays through *every* element of the chain while
the ray state lives in VMEM/registers: the bundle is read from HBM once and
written once, instead of XLA's one fusion per element. Element parameters
(poses, surface constants, support shapes) are baked into the kernel as
compile-time constants — a chain's geometry is fixed for the duration of a
big trace, and re-baking on geometry change is a normal jit recompile.

The kernel body reuses the exact component-form step functions of
:mod:`attosecondraytracing_tpu.ops.trace` (pure jnp on identically-shaped
tiles), so the Pallas path computes the same arithmetic as the XLA path;
tests (tests/test_pallas.py) assert agreement within a small float32
reassociation envelope (Mosaic and XLA may schedule/fuse FLOPs differently,
so bit-exactness is not guaranteed).

Layout: each (N,) ray component is reshaped to (N/128, 128) and tiled in
blocks of (BLOCK_ROWS, 128) — rays on the 128-wide lane axis, full VPU
utilization. Grid-defect interpolation (gathers) is not supported in-kernel;
chains with defects fall back to the XLA path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bundle import RayBundle
from .trace import MaskElement, MirrorElement, TraceState, state_step

LANES = 128
BLOCK_ROWS = 64  # 8192 rays per grid program


def _static_elements(elements):
    """Bake element parameters into nested python-float tuples (compile-time
    constants inside the kernel)."""

    def bake(x):
        arr = np.asarray(x)
        if arr.ndim == 0:
            return float(arr)
        if arr.ndim == 1:
            return tuple(float(v) for v in arr)
        return tuple(tuple(float(v) for v in row) for row in arr)

    baked = []
    for el in elements:
        if isinstance(el, MaskElement):
            baked.append(
                MaskElement(
                    rot=bake(el.rot),
                    position=bake(el.position),
                    support=type(el.support)(*[bake(v) for v in el.support]),
                )
            )
        else:
            if el.defects:
                raise NotImplementedError("pallas_trace does not support defect maps; use the XLA path")
            baked.append(
                MirrorElement(
                    rot=bake(el.rot),
                    position=bake(el.position),
                    centre=bake(el.centre),
                    surface=type(el.surface)(*[bake(v) for v in el.surface]),
                    support=type(el.support)(*[bake(v) for v in el.support]),
                    defects=(),
                )
            )
    return tuple(baked)


def _kernel(px, py, pz, dx, dy, dz, opl, opl_c, alive, inc,
            opx, opy, opz, odx, ody, odz, oopl, oopl_c, oalive, oinc,
            *, elements):
    s = TraceState(
        px=px[:], py=py[:], pz=pz[:],
        dx=dx[:], dy=dy[:], dz=dz[:],
        opl=opl[:], opl_c=opl_c[:],
        alive=alive[:] != 0,
        incidence=inc[:],
    )
    last = len(elements) - 1
    for i, el in enumerate(elements):
        # only the final element's incidence is observable in a no-history
        # trace (matches trace(keep_history=False)); skipping the acos and
        # the carried tile for interior elements saves VPU work
        s = state_step(el, s, want_incidence=(i == last))
    opx[:] = s.px
    opy[:] = s.py
    opz[:] = s.pz
    odx[:] = s.dx
    ody[:] = s.dy
    odz[:] = s.dz
    oopl[:] = s.opl
    oopl_c[:] = s.opl_c
    oalive[:] = s.alive.astype(jnp.int8)
    oinc[:] = s.incidence


@partial(jax.jit, static_argnames=("elements", "block_rows", "interpret"))
def _pallas_trace_padded(comps, elements, block_rows, interpret):
    rows = comps[0].shape[0]
    grid = (rows // block_rows,)
    fspec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    n_f32 = 8  # px..dz, opl, opl_c
    in_specs = [fspec] * n_f32 + [fspec, fspec]  # + alive(int8), incidence
    out_specs = tuple([fspec] * n_f32 + [fspec, fspec])
    dtype = comps[0].dtype
    out_shape = tuple(
        [jax.ShapeDtypeStruct((rows, LANES), dtype)] * n_f32
        + [jax.ShapeDtypeStruct((rows, LANES), jnp.int8), jax.ShapeDtypeStruct((rows, LANES), dtype)]
    )
    return pl.pallas_call(
        partial(_kernel, elements=elements),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,  # CPU CI has no Mosaic backend
    )(*comps)


def pallas_trace(source: RayBundle, elements, block_rows: int = BLOCK_ROWS) -> RayBundle:
    """Trace ``source`` through ``elements`` with the fused kernel; returns
    the final bundle (no history). Geometry is baked statically.

    Like ``trace(keep_history=False)``, the returned ``incidence`` is only
    meaningful for rays alive after the final element: interior steps skip
    the incidence update, so rays that die mid-chain keep their *source*
    incidence, not the incidence at the last element they hit. Dead rays are
    excluded from every reduction, so this is unobservable in statistics."""
    baked = _static_elements(elements)
    n = source.n_rays
    tile = block_rows * LANES
    n_pad = ((n + tile - 1) // tile) * tile
    dtype = jnp.asarray(source.p).dtype

    def prep(x, fill=0.0):
        x = jnp.asarray(x)
        x = jnp.pad(x, (0, n_pad - n), constant_values=fill)
        return x.reshape(n_pad // LANES, LANES)

    comps = [
        prep(source.p[..., 0]), prep(source.p[..., 1]), prep(source.p[..., 2]),
        prep(source.d[..., 0]), prep(source.d[..., 1]), prep(source.d[..., 2]).astype(dtype),
        prep(source.opl), prep(source.opl_c),
        prep(source.alive.astype(jnp.int8)), prep(source.incidence),
    ]
    # padding rays must have a finite direction; mark them dead via alive=0
    interpret = jax.default_backend() == "cpu"
    outs = _pallas_trace_padded(tuple(comps), baked, block_rows, interpret)
    (opx, opy, opz, odx, ody, odz, oopl, oopl_c, oalive, oinc) = outs

    def unprep(x):
        return x.reshape(-1)[:n]

    return RayBundle(
        p=jnp.stack([unprep(opx), unprep(opy), unprep(opz)], axis=-1),
        d=jnp.stack([unprep(odx), unprep(ody), unprep(odz)], axis=-1),
        opl=unprep(oopl),
        opl_c=unprep(oopl_c),
        alive=unprep(oalive) != 0,
        intensity=jnp.asarray(source.intensity),
        incidence=unprep(oinc),
        wavelength=jnp.asarray(source.wavelength),
    )
