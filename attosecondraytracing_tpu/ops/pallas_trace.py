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

HBM traffic: a *fresh* source (opl = opl_c = incidence = 0, all rays alive —
every bundle coming straight from a Source factory) skips those four input
streams entirely; the kernel synthesizes them from compile-time constants and
a row iota (the alive mask of the padding tail is a static index comparison).
That cuts the read side from 37 to 24 bytes/ray, ~18% of total traffic at
the HBM roofline. Detected automatically on concrete (non-traced) bundles;
force with ``fresh=True/False``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bundle import RayBundle
from .trace import (
    MaskElement,
    MirrorElement,
    TraceState,
    compose_chain,
    run_chain_chained,
)

LANES = 128
BLOCK_ROWS = 128  # 16384 rays per grid program (fastest of 32..512 on v5e)


def bake(x):
    """Nested python-float tuples from an array: hashable compile-time
    constants that stay weakly-typed (no f64 upcast) inside an f32 kernel."""
    arr = np.asarray(x)
    if arr.ndim == 0:
        return float(arr)
    if arr.ndim == 1:
        return tuple(float(v) for v in arr)
    return tuple(tuple(float(v) for v in row) for row in arr)


def _static_elements(elements):
    """Bake element parameters into nested python-float tuples (compile-time
    constants inside the kernel)."""

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


def _static_chain(elements):
    """Baked (elements, per-element composed affine maps, final to-lab map)
    for the chained-frame kernel (trace.compose_chain)."""
    baked = _static_elements(elements)
    maps, final = compose_chain(elements)
    baked_maps = tuple((bake(M), bake(b)) for M, b in maps)
    baked_final = tuple(bake(v) for v in final)
    return baked, baked_maps, baked_final


def _run_chain(s: TraceState, elements, maps, final):
    # chained-frame mode: one rotation per element + one final to-lab map,
    # incidence only at the last element (matches trace(keep_history=False);
    # dead rays keep exact lab coordinates — they are re-expressed by every
    # subsequent frame map)
    return run_chain_chained(s, elements, maps, final)


def _write_outputs(s: TraceState, outs):
    (opx, opy, opz, odx, ody, odz, oopl, oopl_c, oalive, oinc) = outs
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


def _kernel(px, py, pz, dx, dy, dz, opl, opl_c, alive, inc, *outs, elements, maps, final):
    s = TraceState(
        px=px[:], py=py[:], pz=pz[:],
        dx=dx[:], dy=dy[:], dz=dz[:],
        opl=opl[:], opl_c=opl_c[:],
        alive=alive[:] != 0,
        incidence=inc[:],
    )
    _write_outputs(_run_chain(s, elements, maps, final), outs)


def _kernel_fresh(px, py, pz, dx, dy, dz, *outs, elements, maps, final, n_rays, block_rows):
    """Fresh-source variant: opl/opl_c/incidence start at 0 and the alive
    mask is just 'is this lane a real ray or padding', a static comparison of
    the global ray index against n_rays — none of the four needs an HBM
    stream."""
    shape = (block_rows, LANES)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    idx = (pl.program_id(0) * block_rows + rows) * LANES + lanes
    zeros = jnp.zeros(shape, dtype=px.dtype)
    s = TraceState(
        px=px[:], py=py[:], pz=pz[:],
        dx=dx[:], dy=dy[:], dz=dz[:],
        opl=zeros, opl_c=zeros,
        alive=idx < n_rays,
        incidence=zeros,
    )
    _write_outputs(_run_chain(s, elements, maps, final), outs)


@partial(jax.jit, static_argnames=("elements", "maps", "final", "block_rows", "interpret", "fresh", "n_rays"))
def _pallas_trace_padded(comps, elements, maps, final, block_rows, interpret, fresh=False, n_rays=0):
    rows = comps[0].shape[0]
    grid = (rows // block_rows,)
    fspec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dtype = comps[0].dtype
    if fresh:
        kernel = partial(_kernel_fresh, elements=elements, maps=maps, final=final,
                         n_rays=n_rays, block_rows=block_rows)
        in_specs = [fspec] * 6  # px..dz only
    else:
        kernel = partial(_kernel, elements=elements, maps=maps, final=final)
        in_specs = [fspec] * 8 + [fspec, fspec]  # px..dz, opl, opl_c, alive(int8), incidence
    n_f32 = 8  # px..dz, opl, opl_c
    out_specs = tuple([fspec] * n_f32 + [fspec, fspec])
    out_shape = tuple(
        [jax.ShapeDtypeStruct((rows, LANES), dtype)] * n_f32
        + [jax.ShapeDtypeStruct((rows, LANES), jnp.int8), jax.ShapeDtypeStruct((rows, LANES), dtype)]
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,  # CPU CI has no Mosaic backend
    )(*comps)


def _is_fresh(source: RayBundle) -> bool:
    """True if the bundle is straight out of a source factory: zero opl,
    zero compensation, zero incidence, all rays alive. Only called on
    concrete (non-traced) arrays."""
    try:
        return bool(
            np.all(np.asarray(source.alive))
            and not np.any(np.asarray(source.opl))
            and not np.any(np.asarray(source.opl_c))
            and not np.any(np.asarray(source.incidence))
        )
    except jax.errors.TracerArrayConversionError:
        return False


def pallas_trace(
    source: RayBundle,
    elements,
    block_rows: int = BLOCK_ROWS,
    fresh: bool | None = None,
) -> RayBundle:
    """Trace ``source`` through ``elements`` with the fused kernel; returns
    the final bundle (no history). Geometry is baked statically.

    Like ``trace(keep_history=False)``, the returned ``incidence`` is only
    meaningful for rays alive after the final element: interior steps skip
    the incidence update, so rays that die mid-chain keep their *source*
    incidence, not the incidence at the last element they hit. Dead rays are
    excluded from every reduction, so this is unobservable in statistics.

    ``fresh=None`` auto-detects whether the source is untouched (all alive,
    zero opl/incidence) and, if so, skips streaming those inputs from HBM.
    """
    baked, maps, final = _static_chain(elements)
    n = source.n_rays
    tile = block_rows * LANES
    n_pad = ((n + tile - 1) // tile) * tile
    dtype = jnp.asarray(source.p).dtype
    if fresh is None:
        fresh = _is_fresh(source)

    def prep(x, fill=0.0):
        x = jnp.asarray(x)
        x = jnp.pad(x, (0, n_pad - n), constant_values=fill)
        return x.reshape(n_pad // LANES, LANES)

    comps = [
        prep(source.p[..., 0]), prep(source.p[..., 1]), prep(source.p[..., 2]),
        prep(source.d[..., 0]), prep(source.d[..., 1]), prep(source.d[..., 2]).astype(dtype),
    ]
    if not fresh:
        comps += [
            prep(source.opl), prep(source.opl_c),
            prep(source.alive.astype(jnp.int8)), prep(source.incidence),
        ]
    # padding rays must have a finite direction; they are dead via the alive
    # mask (streamed, or the fresh path's static index comparison)
    interpret = jax.default_backend() == "cpu"
    outs = _pallas_trace_padded(tuple(comps), baked, maps, final, block_rows,
                                interpret, fresh=fresh, n_rays=n)
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
