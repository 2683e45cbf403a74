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
utilization. Zernike surface defects run in-kernel (pure polynomial
recurrence, coefficients baked); grid-defect interpolation (gathers —
Fourrier/MeasuredMap) is not supported in-kernel, and chains carrying those
fall back to the XLA path.

Frames: the kernel runs the chain in *chained-frame* mode
(trace.compose_chain): one composed 3x3 affine per element instead of a
lab round-trip of two rotations, with patch-relative handoff for float32
conditioning. The composed maps are baked constants. Non-terminal masks are
additionally *folded* (trace.fold_premasks): a mask never bends the ray, so
its transmit/block test runs as a pure alive-predicate on the incoming state
and its frame map composes into the next element's affine — one fewer full
state handoff (+OPL update + select chain) per mask.

HBM traffic, in escalating order of fusion:
* streamed (mid-chain bundles): 37 B/ray read + 37 B/ray written;
* *fresh* source (opl = opl_c = incidence = 0, all alive — any bundle
  straight from a Source factory; auto-detected, force with ``fresh=``):
  the four bookkeeping streams are synthesized in-kernel from a row iota,
  24 B/ray read;
* :func:`pallas_trace_source`: the whole Vogel-spiral source (point cone or
  plane-wave disk) is synthesized in-kernel from the ray index — zero
  per-ray HBM reads, and no 1e7-ray source bundle ever materializes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

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
    chained_step,
    compose_chain,
    fold_premasks,
    run_chain_chained,
)

LANES = 128
BLOCK_ROWS = 64  # 8192 rays per grid program (fastest of 32..512 on v5e;
                 # re-swept after the chained-frame rework, scripts/bench_pallas_vs_xla.py)
#: the trace->moments kernel writes no per-ray outputs (no output-pipelining
#: pressure), so it prefers a larger block: 128 measured ~12% faster than 64
#: (scripts/bench_moment_blocks.py, same-process down-up-down sweep on v5e)
MOMENT_BLOCK_ROWS = 128


def bake(x):
    """Nested python-float tuples from an array: hashable compile-time
    constants that stay weakly-typed (no f64 upcast) inside an f32 kernel."""
    arr = np.asarray(x)
    if arr.ndim == 0:
        return float(arr)
    if arr.ndim == 1:
        return tuple(float(v) for v in arr)
    return tuple(tuple(float(v) for v in row) for row in arr)


def _bake_defect(defect):
    """Hashable compile-time form of a device defect. Zernike defects are
    pure polynomial evaluation (ops/zernike.py, no gathers) — fully
    kernel-compatible; grid-interpolated defects (Fourrier/MeasuredMap) need
    gathers and stay on the XLA path."""
    from .defects import ZernikeDefect

    if isinstance(defect, ZernikeDefect):
        coeffs = defect.coeffs if isinstance(defect.coeffs, dict) else dict(defect.coeffs)
        return ZernikeDefect(
            coeffs=tuple(sorted((k, float(np.asarray(v))) for k, v in coeffs.items())),
            radius=float(np.asarray(defect.radius)),
        )
    raise NotImplementedError(
        "pallas_trace supports only Zernike defects in-kernel; "
        "grid-interpolated defect maps (Fourrier/MeasuredMap) use the XLA path"
    )


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
            baked.append(
                MirrorElement(
                    rot=bake(el.rot),
                    position=bake(el.position),
                    centre=bake(el.centre),
                    surface=type(el.surface)(*[bake(v) for v in el.surface]),
                    support=type(el.support)(*[bake(v) for v in el.support]),
                    defects=tuple(_bake_defect(d) for d in el.defects),
                )
            )
    return tuple(baked)


def _bake_premasks(premasks):
    return tuple(
        tuple(
            (type(sup_)(*[bake(v) for v in sup_]), bake(M), bake(b))
            for (sup_, M, b) in pre
        )
        for pre in premasks
    )


def _static_chain(elements):
    """Baked (elements, per-element composed affine maps, final to-lab map,
    folded premask tests) for the chained-frame kernel (trace.compose_chain +
    trace.fold_premasks: non-terminal masks run as pure alive-predicates)."""
    maps, final = compose_chain(elements)
    elements, maps, premasks = fold_premasks(elements, maps)
    baked = _static_elements(elements)
    baked_maps = tuple((bake(M), bake(b)) for M, b in maps)
    baked_final = tuple(bake(v) for v in final)
    return baked, baked_maps, baked_final, _bake_premasks(premasks)


def _run_chain(s: TraceState, elements, maps, final, ignore_defects=True,
               premasks=None, freeze_dead=True):
    # chained-frame mode: one rotation per element + one final to-lab map,
    # incidence only at the last element (matches trace(keep_history=False)).
    # freeze_dead=True: dead rays keep exact lab coordinates (re-expressed by
    # every subsequent frame map); the fresh/fused-source kernels pass False
    # (bounded-garbage dead values, every consumer masks by alive) for a
    # measured ~20-30% kernel speedup.
    return run_chain_chained(s, elements, maps, final,
                             ignore_defects=ignore_defects, premasks=premasks,
                             freeze_dead=freeze_dead)


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


def _kernel(px, py, pz, dx, dy, dz, opl, opl_c, alive, inc, *outs, elements, maps, final, premasks, ignore_defects):
    s = TraceState(
        px=px[:], py=py[:], pz=pz[:],
        dx=dx[:], dy=dy[:], dz=dz[:],
        opl=opl[:], opl_c=opl_c[:],
        alive=alive[:] != 0,
        incidence=inc[:],
    )
    _write_outputs(_run_chain(s, elements, maps, final, ignore_defects,
                              premasks, freeze_dead=False), outs)


def _kernel_fresh(px, py, pz, dx, dy, dz, *outs, elements, maps, final, premasks, n_rays, block_rows, ignore_defects):
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
    _write_outputs(_run_chain(s, elements, maps, final, ignore_defects,
                              premasks, freeze_dead=False), outs)


@partial(jax.jit, static_argnames=("elements", "maps", "final", "premasks",
                                   "block_rows", "interpret", "fresh", "n_rays",
                                   "ignore_defects"))
def _pallas_trace_padded(comps, elements, maps, final, premasks, block_rows,
                         interpret, fresh=False, n_rays=0, ignore_defects=True):
    rows = comps[0].shape[0]
    grid = (rows // block_rows,)
    fspec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dtype = comps[0].dtype
    if fresh:
        kernel = partial(_kernel_fresh, elements=elements, maps=maps, final=final,
                         premasks=premasks, n_rays=n_rays, block_rows=block_rows,
                         ignore_defects=ignore_defects)
        in_specs = [fspec] * 6  # px..dz only
    else:
        kernel = partial(_kernel, elements=elements, maps=maps, final=final,
                         premasks=premasks, ignore_defects=ignore_defects)
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


# ---------------------------------------------------------------------------
# fused-source kernel: synthesize the Vogel-spiral source in-kernel
# ---------------------------------------------------------------------------

#: golden-ratio turn fraction 1 - 1/phi and its 2^8 / 2^16 multiples mod 1,
#: so frac(k * phi) splits into exact small-float products (see _vogel_xy_c)
_PHI_FRAC = 0.3819660112501051
_PHI_G = tuple(float(np.mod(_PHI_FRAC * 256.0**i, 1.0)) for i in range(3))

# minimax-fit sin(pi x) / cos(pi x) on [-1, 1] (max err ~1e-9, below f32;
# regenerate: least-squares on cos-spaced nodes, see commit message)
_SIN_PI = (3.1415926362231827, -5.16771212974953, 2.550156988459466,
           -0.599230762176276, 0.08206264637303859, -0.007259921822795766,
           0.00039054382726498024)
_COS_PI = (0.999999999885547, -4.934802185862838, 4.058711817231867,
           -1.3352602860924583, 0.2353208253010271, -0.025785808393817295,
           0.0019043286626063097, -8.869084444024393e-05)


def _sincos_pi(x):
    """(sin(pi x), cos(pi x)) for x in [-1, 1] via even/odd polynomials —
    pure mul/add, guaranteed to lower in Mosaic (which has no sin/cos)."""
    x2 = x * x
    s = jnp.asarray(_SIN_PI[-1], x.dtype)
    for c in _SIN_PI[-2::-1]:
        s = s * x2 + c
    s = s * x
    c_ = jnp.asarray(_COS_PI[-1], x.dtype)
    for c in _COS_PI[-2::-1]:
        c_ = c_ * x2 + c
    return s, c_


def _vogel_xy_c(kf, n_rays: int, radius: float, phase=0.0, k_frac=0.0):
    """Vogel-spiral coordinates from exact-integer-valued float ray indices
    ``kf`` (component form, in-kernel safe: float ops only).

    The golden angle ``frac(k * phi)`` is computed by splitting k into base-256
    digits so every product is exactly representable in float32 and the final
    frac() loses at most ~6e-5 turns (~4e-4 rad of spiral phase — irrelevant
    to the spiral's equidistribution, and *identical* in the plain-jnp
    builder, so kernel and reference agree bit-for-bit). Radii are exact:
    ``radius * sqrt(k / N)`` (host Vogel semantics, ops/host_geometry.py).

    Sharded giga-ray sources: a device responsible for global rays
    ``[off, off + n_local)`` passes local indices ``kf`` in [0, n_local),
    ``phase = frac(off * phi)`` (computed host-side in float64 — the global
    golden angle is then EXACT), and ``k_frac = off / n_total`` with
    ``n_rays = n_total`` — the global radius law without ever forming a
    > 2^24 float index."""
    # NOTE: ``kf`` values (local indices) must stay < 2^24 for float
    # exactness — callers chunk/shard larger ranges and pass phase/k_frac;
    # ``n_rays`` (the global total) may be arbitrarily large (it only enters
    # the smooth radius law).
    a = jnp.floor(kf * (1.0 / 65536.0))
    rem = kf - a * 65536.0
    b = jnp.floor(rem * (1.0 / 256.0))
    c = rem - b * 256.0
    tt = a * _PHI_G[2] + b * _PHI_G[1] + c * _PHI_G[0] + phase
    fr = tt - jnp.floor(tt)  # theta in turns, [0, 1)
    x = 2.0 * fr - 1.0       # [-1, 1): theta = pi (x + 1)
    s, co = _sincos_pi(x)
    r = radius * jnp.sqrt(kf * (1.0 / n_rays) + k_frac)
    return -r * co, -r * s   # (r cos theta, r sin theta)


def _divmod_exact(kf, n: int):
    """(q, r) = divmod(kf, n) for exact-integer-valued float ``kf`` < 2^23
    and integer 64 <= n < 2^22: q comes from a rounded reciprocal product
    (off by at most one) and is corrected so r = kf - q*n is the EXACT
    remainder (every product stays exactly representable in float32)."""
    q = jnp.round(kf * (1.0 / n))
    r = kf - q * n
    too_low = r < 0.0
    q = jnp.where(too_low, q - 1.0, q)
    r = jnp.where(too_low, r + n, r)
    too_high = r >= n
    q = jnp.where(too_high, q + 1.0, q)
    r = jnp.where(too_high, r - n, r)
    return q, r


def synth_source_c(kind, kf, n_total, radius, phase=0.0, k_frac=0.0, *,
                   pos_radius=0.0, n_each=0, n_sources=0):
    """Canonical-frame source synthesis from float ray indices (kernel-safe:
    float ops only). Returns ``((px,py,pz), (dx,dy,dz), rr)`` where ``rr``
    is the Gaussian radial-law argument in [0, 1]
    (ApplyGaussianIntensityToRayList semantics: (tan th / tan div)^2 for
    diverging sources, (r/R)^2 for plane waves; weight = edge**rr).

    ``kind='extended'``: ray k decodes to (sub-source i, cone ray j) =
    divmod(k, n_each); ``phase``/``k_frac`` then offset the POSITION spiral
    (i), so chunked/sharded calls must align chunk boundaries to whole
    sub-sources. The cone spiral (j) needs no offset — every sub-source
    emits the identical cone.

    ``kind='square'`` (ART PlaneWaveSquare, ModuleSource.py:173-207 — broken
    there, fixed in models.sources): ray k decodes to grid indices (row i,
    col j) = divmod(k, n_side) with ``n_side`` in ``n_each`` and the side
    length in ``radius``; ``phase`` carries the integer ROW offset for
    chunked calls (the grid has no spiral phase), so chunk boundaries must
    align to whole rows. ``rr`` is corner-normalized: (x²+y²)/(L²/2), the
    exact ApplyGaussianIntensityToRayList law for this grid (the corner ray
    IS the farthest ray)."""
    zeros = jnp.zeros_like(kf)
    ones = zeros + 1.0

    def _rr(x, y):  # Gaussian radial law; radius may be a traced scalar
        return (x * x + y * y) / (jnp.maximum(radius, 1e-300) ** 2)

    if kind == "extended":
        qi, rj = _divmod_exact(kf, n_each)
        sx, sy = _vogel_xy_c(qi, n_sources, 1.0, phase, k_frac)
        sx, sy = sx * pos_radius, sy * pos_radius
        ax, ay = _vogel_xy_c(rj, n_each, 1.0)
        ax, ay = ax * radius, ay * radius
        inv = jax.lax.rsqrt(ax * ax + ay * ay + 1.0)
        return (sx, sy, zeros), (ax * inv, ay * inv, inv), _rr(ax, ay)
    if kind == "square":
        qi, rj = _divmod_exact(kf, n_each)
        qi = qi + phase  # chunk row offset (integer-valued float)
        # host parity: np.linspace(-L/2, L/2, n_side) -> step L/(n_side-1)
        inv_step = 1.0 / (n_each - 1) if n_each > 1 else 0.0
        x = (qi * inv_step - 0.5) * radius
        y = (rj * inv_step - 0.5) * radius
        rr = (x * x + y * y) / (jnp.maximum(radius, 1e-300) ** 2 * 0.5)
        return (x, y, zeros), (zeros, zeros, ones), rr
    cx, cy = _vogel_xy_c(kf, n_total, 1.0, phase, k_frac)
    cx, cy = cx * radius, cy * radius
    if kind == "cone":
        inv = jax.lax.rsqrt(cx * cx + cy * cy + 1.0)
        return (zeros, zeros, zeros), (cx * inv, cy * inv, inv), _rr(cx, cy)
    # 'disk': parallel rays on the spiral
    return (cx, cy, zeros), (zeros, zeros, ones), _rr(cx, cy)


def source_chunks(kind, n_rays, n_total, n_each=0, n_sources=0,
                  chunk=1 << 23, phase=0.0, k_frac=0.0):
    """Kind-aware [(n_local, phase, k_frac)] chunk list covering the global
    source. Plain spirals chunk at arbitrary ray offsets (exact global
    golden angle via frac(off * phi)); 'extended' chunks align to whole
    sub-sources and offset the POSITION spiral instead; 'square' chunks
    align to whole grid rows with the row offset riding in the phase slot."""
    chunks = []
    if kind == "square":
        n_side = n_each
        per = max(1, chunk // n_side) * n_side
        off = 0
        while off < n_rays:
            chunks.append((min(per, n_rays - off),
                           float(phase) + off // n_side, 0.0))
            off += per
        return chunks
    if kind == "extended":
        if n_each >= 1 << 22:
            raise ValueError(
                f"extended-source cones of {n_each} rays exceed the exact "
                f"float div-mod range (2^22); use the streamed trace")
        per = max(1, chunk // n_each) * n_each
        off = 0
        while off < n_rays:
            i0 = off // n_each
            chunks.append((
                min(per, n_rays - off),
                float(np.mod(float(phase) + i0 * _PHI_FRAC, 1.0)),
                float(k_frac) + i0 / max(n_sources, 1),
            ))
            off += per
        return chunks
    off = 0
    while off < n_rays:
        n_local = min(chunk, n_rays - off)
        chunks.append((
            n_local,
            float(np.mod(float(phase) + off * _PHI_FRAC, 1.0)),
            float(k_frac) + off / n_total,
        ))
        off += n_local
    return chunks


class BakedSource(NamedTuple):
    """Compile-time description of an in-kernel source (canonical frame:
    beam along +z; ``rot``/``origin`` place it in the lab).

    ``kind='extended'`` (ART ExtendedSource, ModuleSource.py:85-131) is a
    Vogel grid of ``n_sources`` point sources over a disk of radius
    ``pos_radius``, each emitting the SAME ``n_each``-ray cone of
    half-divergence atan(``radius``): ray k decodes into (source i, cone
    ray j) = divmod(k, n_each) in-kernel with an exact float div-mod."""

    kind: str       # 'cone' (point source) | 'disk' (plane-wave disk) | 'extended'
    rot: tuple      # 3x3 canonical->lab rotation
    origin: tuple   # lab-frame source point / disk centre
    radius: float   # tan(divergence) for 'cone'/'extended', beam radius [mm] for 'disk'
    pos_radius: float = 0.0   # source-disk radius [mm] ('extended')
    n_each: int = 0           # cone rays per sub-source ('extended')
    n_sources: int = 0        # sub-source count ('extended')


def _source_maps(source: BakedSource, elements):
    """Chain maps whose first map takes *canonical source frame* coordinates
    straight into element 0's surface frame (folding the source rotation and
    origin into the baked affine — the kernel never touches lab frames).
    Non-terminal masks are additionally folded into the following element's
    affine (trace.fold_premasks). Returns
    ``(baked_folded_elements, baked_maps, baked_final, baked_premasks)``."""
    maps, final = compose_chain(elements)
    M0, _ = maps[0]
    R0 = np.asarray(M0, dtype=np.float64)
    Rs = np.asarray(source.rot, dtype=np.float64)
    el0 = elements[0]
    pos0 = np.asarray(el0.position, dtype=np.float64)
    cen0 = (
        np.asarray(el0.centre, dtype=np.float64)
        if isinstance(el0, MirrorElement) else np.zeros(3)
    )
    M = R0 @ Rs
    b = R0 @ (np.asarray(source.origin, dtype=np.float64) - pos0) + cen0
    maps = [(M, b)] + list(maps[1:])
    elements, maps, premasks = fold_premasks(elements, maps)
    baked_maps = tuple((bake(Mm), bake(bb)) for Mm, bb in maps)
    baked_final = tuple(bake(v) for v in final)
    return (_static_elements(elements), baked_maps, baked_final,
            _bake_premasks(premasks))


def _kernel_source(scalars, *outs, source, elements, maps, final, premasks,
                   n_rays, n_total, block_rows, ignore_defects):
    """Near-zero-input kernel: the source bundle is synthesized from the ray
    index (iota), so the trace reads nothing per-ray from HBM — only the
    traced bundle is written (~40% of the fused kernel's HBM traffic was the
    read side). The one scalar input is a spiral phase offset [turns] for
    decorrelated Monte-Carlo source realizations."""
    shape = (block_rows, LANES)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    idx = (pl.program_id(0) * block_rows + rows) * LANES + lanes
    kf = idx.astype(jnp.float32)
    (px, py, pz), (dx, dy, dz), _rr = synth_source_c(
        source.kind, kf, n_total, source.radius, scalars[0], scalars[1],
        pos_radius=source.pos_radius, n_each=source.n_each,
        n_sources=source.n_sources)
    zeros = jnp.zeros(shape, dtype=jnp.float32)
    s = TraceState(
        px=px + zeros, py=py + zeros, pz=pz + zeros,
        dx=dx + zeros, dy=dy + zeros, dz=dz + zeros,
        opl=zeros, opl_c=zeros,
        alive=idx < n_rays,
        incidence=zeros,
    )
    _write_outputs(_run_chain(s, elements, maps, final, ignore_defects,
                              premasks, freeze_dead=False), outs)


@partial(jax.jit, static_argnames=("source", "elements", "maps", "final",
                                   "premasks", "block_rows", "interpret",
                                   "n_rays", "n_total", "rows", "ignore_defects"))
def _pallas_trace_source_padded(phase, k_frac, source, elements, maps, final,
                                premasks, block_rows, interpret, n_rays,
                                n_total, rows, ignore_defects=True):
    if n_rays >= 1 << 24:
        raise ValueError("per-call ray count must stay < 2^24 (float index "
                         "exactness); chunk or shard larger ranges")
    grid = (rows // block_rows,)
    fspec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    kernel = partial(_kernel_source, source=source, elements=elements,
                     maps=maps, final=final, premasks=premasks, n_rays=n_rays,
                     n_total=n_total, block_rows=block_rows,
                     ignore_defects=ignore_defects)
    out_shape = tuple(
        [jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * 8
        + [jax.ShapeDtypeStruct((rows, LANES), jnp.int8),
           jax.ShapeDtypeStruct((rows, LANES), jnp.float32)]
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[sspec],
        out_specs=tuple([fspec] * 10),
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.stack([jnp.asarray(phase, jnp.float32),
                 jnp.asarray(k_frac, jnp.float32)]))


def make_source_spec(kind: str, S, Axis, param: float, diameter: float = 0.0,
                     n_rays: int = 0) -> BakedSource:
    """BakedSource from reference-style source arguments.

    ``kind='cone'``: point source at ``S`` with half-divergence ``param``
    [rad] (ART PointSource, ModuleSource.py:54-81). ``kind='disk'``:
    plane-wave disk of radius ``param`` [mm] centred at ``S`` (ART
    PlaneWaveDisk, ModuleSource.py:135-169). ``kind='extended'``: Vogel grid
    of point sources over a disk of ``diameter``, each a ``param``-rad cone
    (ART ExtendedSource, ModuleSource.py:85-131 — same sub-source count
    heuristics as models.sources.ExtendedSource, which need ``n_rays``)."""
    from .host_geometry import rotation_from_to

    axis = np.asarray(Axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    # canonical->lab: p_lab = R p_c (sources._finish applies points @ R.T)
    rot = rotation_from_to(np.array([0.0, 0.0, 1.0]), axis)
    base = dict(rot=bake(rot), origin=bake(np.asarray(S, float)))
    if kind == "extended":
        from .host_geometry import extended_source_counts

        n_sources, n_each = extended_source_counts(diameter, n_rays)
        return BakedSource(kind=kind, radius=float(np.tan(param)),
                           pos_radius=float(diameter) / 2.0,
                           n_each=n_each, n_sources=n_sources, **base)
    if kind == "square":
        # collimated square grid: param = side length [mm]; the emitted
        # count is n_side^2 (models.sources.PlaneWaveSquare semantics)
        n_side = max(int(np.sqrt(n_rays)), 1)
        return BakedSource(kind=kind, radius=float(param), n_each=n_side,
                           **base)
    radius = float(np.tan(param)) if kind == "cone" else float(param)
    return BakedSource(kind=kind, radius=radius, **base)


def source_bundle(spec: BakedSource, n_rays: int, wavelength=50e-6, phase=0.0,
                  k_frac=0.0, n_total=None) -> RayBundle:
    """Plain-jnp builder of the exact bundle the fused-source kernel
    synthesizes (same float32 formulas), for tests and for consumers that
    need the source side (e.g. the transmission denominator)."""
    kf = jnp.arange(n_rays, dtype=jnp.float32)
    (px, py, pz), (dx, dy, dz), _rr = synth_source_c(
        spec.kind, kf, n_total or n_rays, spec.radius, jnp.float32(phase),
        jnp.float32(k_frac), pos_radius=spec.pos_radius, n_each=spec.n_each,
        n_sources=spec.n_sources)
    zeros = jnp.zeros((n_rays,), dtype=jnp.float32)
    p = jnp.stack([px + zeros, py + zeros, pz + zeros], axis=-1)
    d = jnp.stack([dx + zeros, dy + zeros, dz + zeros], axis=-1)
    rot = jnp.asarray(spec.rot, jnp.float32)
    origin = jnp.asarray(spec.origin, jnp.float32)
    # full-f32 matmul: the TPU bf16 default would tilt probe rays by ~1e-3
    # rad, throwing the chief-ray reference path off by millimetres
    mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    return RayBundle(
        p=mm(p, rot.T) + origin,
        d=mm(d, rot.T),
        opl=zeros, opl_c=zeros,
        alive=jnp.ones((n_rays,), dtype=bool),
        intensity=jnp.ones((n_rays,), dtype=jnp.float32),
        incidence=zeros,
        wavelength=jnp.asarray(wavelength, jnp.float32),
    )


def pallas_trace_source(
    spec: BakedSource,
    elements,
    n_rays: int,
    wavelength=50e-6,
    block_rows: int = BLOCK_ROWS,
    phase=0.0,
    k_frac=0.0,
    n_total: int | None = None,
    ignore_defects: bool = True,
) -> RayBundle:
    """Trace ``n_rays`` from an in-kernel-synthesized source through
    ``elements``; the kernel reads zero bytes from HBM (the source is pure
    math from the ray index — replaces streaming a 240 MB bundle at 1e7
    rays). Returns the final bundle (no history); same caveats as
    :func:`pallas_trace`. Intensities are uniform 1.0 — apply Gaussian
    weights downstream if needed (they multiply, the trace never reads
    them)."""
    from .warmup import note_dispatch

    note_dispatch()
    baked, maps, final, premasks = _source_maps(spec, elements)
    tile = block_rows * LANES
    n_pad = ((n_rays + tile - 1) // tile) * tile
    interpret = jax.default_backend() == "cpu"
    outs = _pallas_trace_source_padded(
        phase, k_frac, spec, baked, maps, final, premasks, block_rows,
        interpret, n_rays, n_total or n_rays, n_pad // LANES, ignore_defects
    )
    (opx, opy, opz, odx, ody, odz, oopl, oopl_c, oalive, oinc) = outs

    def unprep(x):
        return x.reshape(-1)[:n_rays]

    return RayBundle(
        p=jnp.stack([unprep(opx), unprep(opy), unprep(opz)], axis=-1),
        d=jnp.stack([unprep(odx), unprep(ody), unprep(odz)], axis=-1),
        opl=unprep(oopl),
        opl_c=unprep(oopl_c),
        alive=unprep(oalive) != 0,
        intensity=jnp.ones((n_rays,), dtype=jnp.float32),
        incidence=unprep(oinc),
        wavelength=jnp.asarray(wavelength, jnp.float32),
    )


# ---------------------------------------------------------------------------
# fused trace -> detector statistics kernel
# ---------------------------------------------------------------------------


class BakedDetector(NamedTuple):
    """Detector plane expressed in the LAST element's patch-relative frame
    (so the kernel never returns to lab coordinates): ``centre``/``normal``
    are the plane, ``e1``/``e2`` the in-plane axes of the detector frame
    (rows of the host Detector's plane rotation), ``distances`` the scan
    offsets along -normal (Detector.shiftByDistance semantics), ``opl_ref``
    a chief-ray reference path subtracted before squaring so float32
    delay accumulation never squares metre-scale numbers."""

    centre: tuple
    normal: tuple
    e1: tuple
    e2: tuple
    distances: tuple
    opl_ref: float
    #: per-distance chief-ray leg increment subtracted in-kernel so the
    #: accumulated delays stay fs-scale at EVERY scan position (shifting the
    #: detector by d mm shifts every delay by ~d mm; squaring that in f32
    #: would drown the fs-scale variance)
    delay_offsets: tuple = ()
    #: chief ray's 1/(d.n): the moment epilogue subtracts it from each ray's
    #: own inverse plane-approach rate so the distance-coefficient of the
    #: delay stays fs/mm-scale (equivalent to delay_offsets, but as a single
    #: constant instead of one offset per baked distance)
    inv_dn_chief: float = 0.0


def bake_detector(elements, det_centre, det_normal, det_rot,
                  distances=(0.0,), opl_ref=0.0, delay_offsets=None,
                  inv_dn_chief=0.0) -> BakedDetector:
    """Express a lab-frame detector plane in the final element's
    patch-relative frame (see run_chain_chained's output convention:
    p_lab = R_K^T x_rel + pos_K)."""
    _, final = compose_chain(elements)
    R_K, pos_K = final
    R_K = np.asarray(R_K, dtype=np.float64)
    c_rel = R_K @ (np.asarray(det_centre, np.float64) - np.asarray(pos_K, np.float64))
    n_rel = R_K @ np.asarray(det_normal, np.float64)
    rot = np.asarray(det_rot, np.float64)
    e1 = R_K @ rot[0]
    e2 = R_K @ rot[1]
    if delay_offsets is None:
        delay_offsets = (0.0,) * len(distances)
    return BakedDetector(
        centre=bake(c_rel), normal=bake(n_rel), e1=bake(e1), e2=bake(e2),
        distances=tuple(float(d) for d in distances), opl_ref=float(opl_ref),
        delay_offsets=tuple(float(v) for v in delay_offsets),
        inv_dn_chief=float(inv_dn_chief),
    )


#: per-distance statistics accumulated by the stats kernel, in output order
STATS_FIELDS = ("w", "wx", "wy", "wxx", "wyy", "wd", "wdd")


def _stats_epilogue(s: TraceState, det: BakedDetector, weights, outs, block_rows):
    """Project the traced (patch-relative, final-frame) state onto the
    detector plane at every scan distance and accumulate weighted sums.

    Writes one (1, LANES) row per output stat: lane j holds distance j's
    partial sum for this grid program (J <= LANES distances per kernel)."""
    rows = stats_rows(s, det, weights)
    for name, ref in zip(STATS_FIELDS, outs):
        ref[:] = rows[name]


def stats_rows(s: TraceState, det: BakedDetector, weights):
    """Pure form of the stats epilogue: dict of (8, LANES) partial-sum rows
    (row 0, lane j = distance j). Kept side-effect-free so the forward-mode
    gradient kernel (ops/pallas_grad.py) can jax.jvp through it."""
    w = jnp.where(s.alive, weights, 0.0)
    c, n = det.centre, det.normal
    dn = s.dx * n[0] + s.dy * n[1] + s.dz * n[2]
    # NOTE: keep the exact divide here (not surfaces._recip): its ~2-3 ulp
    # reciprocal error on the ~500 mm detector leg would add ~0.4 fs of
    # per-ray delay noise to the duration metric — an accuracy cost, for one
    # divide per ray in a kernel dominated by the trace itself
    inv_dn = 1.0 / jnp.where(jnp.abs(dn) > 1e-30, dn, jnp.inf)
    b0 = (c[0] - s.px) * n[0] + (c[1] - s.py) * n[1] + (c[2] - s.pz) * n[2]
    t0 = b0 * inv_dn
    a1 = (s.px - c[0]) * det.e1[0] + (s.py - c[1]) * det.e1[1] + (s.pz - c[2]) * det.e1[2]
    a2 = (s.px - c[0]) * det.e2[0] + (s.py - c[1]) * det.e2[1] + (s.pz - c[2]) * det.e2[2]
    g1 = s.dx * det.e1[0] + s.dy * det.e1[1] + s.dz * det.e1[2]
    g2 = s.dx * det.e2[0] + s.dy * det.e2[1] + s.dz * det.e2[2]
    # small residual path: (opl - ref) is a same-magnitude subtraction
    # (exact), then the Kahan compensation applies at full significance
    dsmall = (s.opl - det.opl_ref) - s.opl_c

    # Mosaic block constraint: outputs must tile to (8, 128). Each program
    # writes one (8, 128) block whose row 0 holds its per-distance partial
    # sums (rows 1..7 are zero; the host slices them away).
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    row0 = (jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0) == 0)
    rows = {name: jnp.zeros((8, LANES), jnp.float32) for name in STATS_FIELDS}
    for j, dist in enumerate(det.distances):
        # shiftByDistance: centre_j = centre - dist * normal
        tj = t0 - dist * inv_dn
        xj = a1 + tj * g1
        yj = a2 + tj * g2
        dj = (dsmall + tj) - det.delay_offsets[j]
        onehot = ((lane == j) & row0).astype(jnp.float32)
        vals = {
            "w": w, "wx": w * xj, "wy": w * yj,
            "wxx": w * xj * xj, "wyy": w * yj * yj,
            "wd": w * dj, "wdd": w * dj * dj,
        }
        for name, v in vals.items():
            rows[name] = rows[name] + jnp.sum(v) * onehot
    return rows


#: distance-independent weighted moments accumulated by the moment epilogue,
#: in lane order. Per ray, with x0/y0/d0 the impact coordinates and (small)
#: delay at scan distance 0 and cx/cy/cd their (small) distance-coefficients
#: (x_j = x0 - d cx, y_j = y0 - d cy, delay_j = d0 - d cd), every
#: per-distance weighted sum the stats need is an EXACT quadratic in the
#: scan distance d — so the kernel reduces 16 numbers once and any number of
#: scan distances are evaluated on the host in float64
#: (:func:`moments_to_distance_sums`).
MOMENT_FIELDS = (
    "w", "x0", "y0", "d0", "cx", "cy", "cd",
    "x0x0", "y0y0", "d0d0", "x0cx", "y0cy", "d0cd",
    "cxcx", "cycy", "cdcd",
)


def moment_rows(s: TraceState, det: BakedDetector, weights,
                centre_distance=0.0):
    """One (8, LANES) block whose row 0 holds this program's 16 weighted
    moment partial sums (lane m = MOMENT_FIELDS[m]).

    Conditioning: ``d0`` is the delay relative to the chief ray (fs-scale, as
    in stats_rows), ``cd = inv_dn - inv_dn_chief`` the *deviation* of the
    ray's inverse plane-approach rate from the chief ray's (the exact per-ray
    equivalent of stats_rows' per-distance ``delay_offsets`` subtraction), so
    no delay moment ever squares an mm-scale number. The spot moments square
    the impact coordinates AT THE EXPANSION POINT ``centre_distance`` [mm, a
    runtime scalar — shiftByDistance convention]: pass a point near the focus
    (e.g. from a cheap probe estimate) when the d=0 plane is far from it —
    squaring multi-mm off-focus coordinates in the f32 accumulator would
    otherwise bury the µm-scale focal variance in reconstruction
    cancellation. Host-side evaluation must use distances RELATIVE to the
    same expansion point (moments_to_distance_sums' ``centre_distance``)."""
    w = jnp.where(s.alive, weights, 0.0)
    c, n = det.centre, det.normal
    dn = s.dx * n[0] + s.dy * n[1] + s.dz * n[2]
    # keep the exact divide (see stats_rows NOTE): reciprocal noise on the
    # ~500 mm leg would add ~0.4 fs of per-ray delay noise
    inv_dn = 1.0 / jnp.where(jnp.abs(dn) > 1e-30, dn, jnp.inf)
    b0 = (c[0] - s.px) * n[0] + (c[1] - s.py) * n[1] + (c[2] - s.pz) * n[2]
    t0 = (b0 - centre_distance) * inv_dn  # leg to the d_c-shifted plane
    a1 = (s.px - c[0]) * det.e1[0] + (s.py - c[1]) * det.e1[1] + (s.pz - c[2]) * det.e1[2]
    a2 = (s.px - c[0]) * det.e2[0] + (s.py - c[1]) * det.e2[1] + (s.pz - c[2]) * det.e2[2]
    g1 = s.dx * det.e1[0] + s.dy * det.e1[1] + s.dz * det.e1[2]
    g2 = s.dx * det.e2[0] + s.dy * det.e2[1] + s.dz * det.e2[2]
    x0 = a1 + t0 * g1
    y0 = a2 + t0 * g2
    cx = inv_dn * g1
    cy = inv_dn * g2
    cd = inv_dn - det.inv_dn_chief
    d0 = (s.opl - det.opl_ref) - s.opl_c + t0 + centre_distance * det.inv_dn_chief
    vals = {
        "w": w, "x0": w * x0, "y0": w * y0, "d0": w * d0,
        "cx": w * cx, "cy": w * cy, "cd": w * cd,
        "x0x0": w * x0 * x0, "y0y0": w * y0 * y0, "d0d0": w * d0 * d0,
        "x0cx": w * x0 * cx, "y0cy": w * y0 * cy, "d0cd": w * d0 * cd,
        "cxcx": w * cx * cx, "cycy": w * cy * cy, "cdcd": w * cd * cd,
    }
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    row0 = (jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0) == 0)
    out = jnp.zeros((8, LANES), jnp.float32)
    for m, name in enumerate(MOMENT_FIELDS):
        out = out + jnp.sum(vals[name]) * ((lane == m) & row0).astype(jnp.float32)
    return out


def moments_to_distance_sums(moments, distances, centre_distance=0.0):
    """Per-distance weighted sums (stats_rows'/STATS_FIELDS' semantics) from
    the 16 moment sums, evaluated in float64 for arbitrarily many distances.

    ``moments``: (16,) array-like in MOMENT_FIELDS order (already reduced
    over programs/chunks/devices); ``centre_distance`` must equal the
    expansion point the moments were accumulated about (moment_rows).
    Returns a dict of (J,) float64 arrays."""
    m = {name: np.float64(v) for name, v in zip(MOMENT_FIELDS, np.asarray(moments, np.float64))}
    d = np.asarray(distances, np.float64) - float(centre_distance)
    return {
        "w": np.broadcast_to(m["w"], d.shape).copy(),
        "wx": m["x0"] - d * m["cx"],
        "wy": m["y0"] - d * m["cy"],
        "wxx": m["x0x0"] - 2.0 * d * m["x0cx"] + d * d * m["cxcx"],
        "wyy": m["y0y0"] - 2.0 * d * m["y0cy"] + d * d * m["cycy"],
        "wd": m["d0"] - d * m["cd"],
        "wdd": m["d0d0"] - 2.0 * d * m["d0cd"] + d * d * m["cdcd"],
    }


def chief_ray_refs(spec: BakedSource, elements, det_centre, det_normal,
                   distances, opl_ref: float | None = None):
    """(opl_ref, delay_offsets, inv_dn_chief) for the stats kernels: the
    optical path of a surviving probe ray to the detector plane and, per scan
    distance, its leg increment (so in-kernel delays stay fs-scale at every
    scan position); ``inv_dn_chief`` is the same correction as a single
    constant for the moment epilogue.

    A small probe bundle is traced on the XLA path; if no probe ray survives
    the chain, the probe is retried with more rays before failing loudly —
    silently indexing a dead ray would return garbage statistics (argmax of an
    all-False mask is 0)."""
    from .trace import trace_jit

    pout = None
    for n_probe in (8, 256, 8192):
        probe = source_bundle(spec, n_probe, wavelength=50e-6)
        pout = trace_jit(probe, elements, keep_history=False)
        if bool(np.asarray(pout.alive).any()):
            break
    else:
        raise RuntimeError(
            "chief-ray probe: no ray survives the chain (tried up to 8192 "
            "probe rays) — the detector statistics would be meaningless. "
            "Check the chain alignment/supports before running a stats scan."
        )
    k0 = int(np.argmax(np.asarray(pout.alive)))
    p = np.asarray(pout.p, np.float64)[k0]
    d = np.asarray(pout.d, np.float64)[k0]
    c = np.asarray(det_centre, np.float64)
    n = np.asarray(det_normal, np.float64)
    dn = float(d @ n)
    if abs(dn) < 1e-30:
        raise RuntimeError("chief-ray probe: surviving ray is parallel to the detector plane")
    t_leg = float((c - p) @ n) / dn
    if opl_ref is None:
        opl_ref = float(
            np.asarray(pout.opl, np.float64)[k0]
            - np.asarray(pout.opl_c, np.float64)[k0] + t_leg
        )
    delay_offsets = tuple(float(-dist / dn) for dist in distances)
    return float(opl_ref), delay_offsets, float(1.0 / dn)


def _synth_traced_state(scalars, source, elements, maps, premasks, n_rays,
                        n_total, block_rows, gaussian_edge, ignore_defects):
    """Shared stats/moments kernel preamble: synthesize the Vogel source from
    the ray index (scalars[0]=spiral phase, scalars[1]=k_frac), apply the
    Gaussian weight profile (`gaussian_edge` at the spiral rim —
    ApplyGaussianIntensityToRayList, ART/ModuleSource.py:219-261), and trace
    the chain in chained-frame mode. Returns (traced state, weights)."""
    shape = (block_rows, LANES)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    idx = (pl.program_id(0) * block_rows + rows) * LANES + lanes
    kf = idx.astype(jnp.float32)
    (px, py, pz), (dx, dy, dz), rr = synth_source_c(
        source.kind, kf, n_total, source.radius, scalars[0], scalars[1],
        pos_radius=source.pos_radius, n_each=source.n_each,
        n_sources=source.n_sources)
    zeros = jnp.zeros(shape, dtype=jnp.float32)
    ones = jnp.ones(shape, dtype=jnp.float32)
    if gaussian_edge is None:
        weights = ones
    else:
        weights = jnp.exp(float(np.log(gaussian_edge)) * rr)
    s = TraceState(
        px=px + zeros, py=py + zeros, pz=pz + zeros,
        dx=dx + zeros, dy=dy + zeros, dz=dz + zeros,
        opl=zeros, opl_c=zeros,
        alive=idx < n_rays,
        incidence=zeros,
    )
    for el, (M, b), pre in zip(elements, maps, premasks):
        # incidence is never observed by the statistics: skip it everywhere;
        # dead-ray state only ever reaches alive-masked reductions, so the
        # freeze selects are skipped too (trace.chained_step freeze_dead)
        s = chained_step(el, M, b, s, want_incidence=False,
                         ignore_defects=ignore_defects, premasks=pre,
                         freeze_dead=False)
    return s, weights


def _kernel_source_stats(scalars, *outs, source, elements, maps, final,
                         premasks, det, n_rays, n_total, block_rows,
                         gaussian_edge, ignore_defects):
    """Legacy per-distance stats kernel (7 reductions x baked distance).
    Superseded as the production scan path by the J-independent moment
    kernel (_kernel_source_moments); kept as the comparison baseline for
    scripts/bench_stats_kernel.py and as the J=1 epilogue reference that
    ops/pallas_grad.py JVPs through (stats_rows)."""
    s, weights = _synth_traced_state(
        scalars, source, elements, maps, premasks, n_rays, n_total,
        block_rows, gaussian_edge, ignore_defects)
    _stats_epilogue(s, det, weights, outs, block_rows)


@partial(jax.jit, static_argnames=("source", "elements", "maps", "final",
                                   "premasks", "det", "block_rows", "interpret",
                                   "n_rays", "n_total", "rows", "gaussian_edge",
                                   "ignore_defects"))
def _pallas_source_stats_padded(phase, k_frac, source, elements, maps, final,
                                premasks, det, block_rows, interpret, n_rays,
                                n_total, rows, gaussian_edge,
                                ignore_defects=True):
    if n_rays >= 1 << 24:
        raise ValueError("per-call ray count must stay < 2^24 (float index "
                         "exactness); chunk or shard larger ranges")
    grid = (rows // block_rows,)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    rowspec = pl.BlockSpec((8, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = partial(_kernel_source_stats, source=source, elements=elements,
                     maps=maps, final=final, premasks=premasks, det=det,
                     n_rays=n_rays, n_total=n_total, block_rows=block_rows,
                     gaussian_edge=gaussian_edge, ignore_defects=ignore_defects)
    n_programs = rows // block_rows
    out_shape = tuple(
        jax.ShapeDtypeStruct((n_programs * 8, LANES), jnp.float32)
        for _ in STATS_FIELDS
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[sspec],
        out_specs=tuple([rowspec] * len(STATS_FIELDS)),
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.stack([jnp.asarray(phase, jnp.float32),
                 jnp.asarray(k_frac, jnp.float32)]))


def _kernel_source_moments(scalars, out, *, source, elements, maps, final,
                           premasks, det, n_rays, n_total, block_rows,
                           gaussian_edge, ignore_defects):
    s, weights = _synth_traced_state(
        scalars, source, elements, maps, premasks, n_rays, n_total,
        block_rows, gaussian_edge, ignore_defects)
    # scalars[2]: runtime expansion point d_c [mm] (see moment_rows)
    out[:] = moment_rows(s, det, weights, centre_distance=scalars[2])


@partial(jax.jit, static_argnames=("source", "elements", "maps", "final",
                                   "premasks", "det", "block_rows", "interpret",
                                   "n_rays", "n_total", "rows", "gaussian_edge",
                                   "ignore_defects"))
def _pallas_source_moments_padded(phase, k_frac, centre_distance, source,
                                  elements, maps, final, premasks, det,
                                  block_rows, interpret, n_rays, n_total, rows,
                                  gaussian_edge, ignore_defects=True):
    """Fused source->trace->MOMENT epilogue: one (n_programs*8, LANES) block
    whose row 8i holds program i's 16 distance-independent moment sums,
    accumulated about the runtime expansion point ``centre_distance``. The
    per-distance statistics for ANY number of scan distances follow on the
    host (:func:`moments_to_distance_sums`) — the kernel cost is
    J-independent, and the scan distances AND expansion point are runtime
    values (re-baking them never recompiles)."""
    if n_rays >= 1 << 24:
        raise ValueError("per-call ray count must stay < 2^24 (float index "
                         "exactness); chunk or shard larger ranges")
    grid = (rows // block_rows,)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    rowspec = pl.BlockSpec((8, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = partial(_kernel_source_moments, source=source, elements=elements,
                     maps=maps, final=final, premasks=premasks, det=det,
                     n_rays=n_rays, n_total=n_total, block_rows=block_rows,
                     gaussian_edge=gaussian_edge, ignore_defects=ignore_defects)
    n_programs = rows // block_rows
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[sspec],
        out_specs=rowspec,
        out_shape=jax.ShapeDtypeStruct((n_programs * 8, LANES), jnp.float32),
        interpret=interpret,
    )(jnp.stack([jnp.asarray(phase, jnp.float32),
                 jnp.asarray(k_frac, jnp.float32),
                 jnp.asarray(centre_distance, jnp.float32)]))


def pallas_source_detector_stats(
    spec: BakedSource,
    elements,
    n_rays: int,
    det_centre,
    det_normal,
    det_rot,
    distances=(0.0,),
    opl_ref: float | None = None,
    gaussian_edge: float | None = None,
    block_rows: int = MOMENT_BLOCK_ROWS,
    phase=0.0,
    k_frac=0.0,
    n_total: int | None = None,
    ignore_defects: bool = True,
    centre_distance: float = 0.0,
):
    """Whole production pipeline in ONE kernel pass: synthesize the source,
    trace the chain, project onto the detector plane at every scan distance,
    and reduce to weighted statistics — nothing per-ray ever touches HBM.

    Replaces trace + Detector.get_PointList2D/get_Delays + SD reductions
    (ART/ModuleProcessing.py:317-366 evaluates these at 20 scan positions per
    refinement round; here a whole scan round is one kernel launch at any
    bundle size). Returns a dict with per-distance arrays:

    - ``spot_sd`` (J,) [mm], ``duration_sd`` (J,) [fs]  — the OptFor metrics
    - ``mean_x``/``mean_y`` (J,) [mm], ``mean_delay`` (J,) [fs]
    - ``sum_w`` (J,) — surviving (weighted) rays; transmission % =
      100 * sum_w / total source weight.

    ``distances`` are shifts along -normal from ``det_centre``
    (Detector.shiftByDistance semantics) — any number per call: the kernel
    reduces 16 distance-independent MOMENTS (every per-distance sum is an
    exact quadratic in the scan distance, see :data:`MOMENT_FIELDS`), so the
    kernel cost is J-independent and the distances are evaluated on the host
    in float64. Re-baking a new distance set does NOT recompile. ``opl_ref``
    defaults to the chief ray's optical path to the detector plane (computed
    with a tiny on-the-fly trace) — it only needs to be near the bundle mean
    so float32 squares stay small.

    Precision floor: spot SDs are accurate to ~0.2%; duration SDs carry the
    float32 trace's per-ray OPL noise (~0.6 fs, quadrature-additive — same
    class as the XLA path's 0.4 fs floor, tests/test_surfaces.py), so
    sub-femtosecond durations read as ~0.6-0.9 fs. For sub-fs focus
    metrology run the two-pass path (trace + detector_delays) in float64."""
    mom = pallas_source_detector_moments(
        spec, elements, n_rays, det_centre, det_normal, det_rot,
        opl_ref=opl_ref, gaussian_edge=gaussian_edge, block_rows=block_rows,
        phase=phase, k_frac=k_frac, n_total=n_total,
        ignore_defects=ignore_defects, centre_distance=centre_distance,
    )
    sums = moments_to_distance_sums(mom["moments"], distances,
                                    mom["centre_distance"])
    return sums_to_stats(sums, mom["opl_ref"], distances)


def sums_to_stats(sums, opl_ref, distances):
    """Per-distance statistics dict from STATS_FIELDS weighted sums — the
    single definition shared by the single-device and sharded stats paths
    (means, clamped variances, fs conversion)."""
    from .precision import LIGHT_SPEED_MM_S

    w = np.maximum(sums["w"], 1e-30)
    mean_x, mean_y = sums["wx"] / w, sums["wy"] / w
    var_x = np.maximum(sums["wxx"] / w - mean_x**2, 0.0)
    var_y = np.maximum(sums["wyy"] / w - mean_y**2, 0.0)
    mean_d = sums["wd"] / w
    var_d = np.maximum(sums["wdd"] / w - mean_d**2, 0.0)
    to_fs = 1e15 / LIGHT_SPEED_MM_S
    return {
        "spot_sd": np.sqrt(var_x + var_y),
        "duration_sd": np.sqrt(var_d) * to_fs,
        "mean_x": mean_x,
        "mean_y": mean_y,
        "mean_delay": mean_d * to_fs,  # relative to opl_ref, [fs]
        "sum_w": sums["w"],
        "opl_ref": opl_ref,
        "distances": np.asarray(distances, np.float64),
    }


def pallas_source_detector_moments(
    spec: BakedSource,
    elements,
    n_rays: int,
    det_centre,
    det_normal,
    det_rot,
    opl_ref: float | None = None,
    gaussian_edge: float | None = None,
    block_rows: int = MOMENT_BLOCK_ROWS,
    phase=0.0,
    k_frac=0.0,
    n_total: int | None = None,
    ignore_defects: bool = True,
    centre_distance: float = 0.0,
):
    """The 16 distance-independent weighted moments (:data:`MOMENT_FIELDS`,
    float64) of the traced bundle on the detector plane — the complete
    description of every per-distance statistic as an exact quadratic in the
    scan distance (the alive mask cannot depend on the detector distance, so
    the quadratics hold GLOBALLY, not as local approximations). One kernel
    pass; chunked beyond 2^23 rays. Returns ``{"moments", "opl_ref",
    "inv_dn_chief", "centre_distance"}``.

    ``centre_distance`` [mm, shiftByDistance convention, runtime — no
    recompile] sets the expansion point the spot moments are squared about:
    pass a focus estimate when the d=0 plane is far off-focus, or the f32
    accumulator buries the focal-plane variance (see moment_rows). It is
    quantized to float32 so host reconstruction matches the kernel exactly;
    the quantized value is returned."""
    centre_distance = float(np.float32(centre_distance))
    # chief-ray reference path + inverse-approach-rate constant: keep the
    # in-kernel delay moments fs-scale (see moment_rows)
    opl_ref, _delay_offsets, inv_dn_chief = chief_ray_refs(
        spec, elements, det_centre, det_normal, (0.0,), opl_ref
    )

    from .warmup import note_dispatch

    note_dispatch()
    det = bake_detector(elements, det_centre, det_normal, det_rot,
                        opl_ref=opl_ref, inv_dn_chief=inv_dn_chief)
    baked, maps, final, premasks = _source_maps(spec, elements)
    interpret = jax.default_backend() == "cpu"
    n_total = n_total or n_rays

    # chunk the ray range so per-kernel float indices stay exact (< 2^24):
    # a single chip reaches billion-ray scans by accumulating the f64
    # partial sums over ~n/2^23 kernel passes — the same (phase, k_frac)
    # mechanism the multi-device sharding uses
    CHUNK = 1 << 23
    if n_rays <= CHUNK:
        chunks = [(n_rays, phase, k_frac)]
    else:
        if not isinstance(phase, (int, float)) or not isinstance(k_frac, (int, float)):
            raise ValueError("chunked (>2^23 ray) scans need python-float phase/k_frac")
        chunks = source_chunks(spec.kind, n_rays, n_total, spec.n_each,
                               spec.n_sources, CHUNK, float(phase),
                               float(k_frac))
    tile = block_rows * LANES

    @partial(jax.jit, static_argnames=("n_local", "rows"))
    def _chunk(phase_i, k_frac_i, n_local, rows):
        out = _pallas_source_moments_padded(
            phase_i, k_frac_i, centre_distance, spec, baked, maps, final,
            premasks, det, block_rows, interpret, n_local, n_total, rows,
            gaussian_edge, ignore_defects,
        )
        # reduce the per-program partials ON DEVICE: only one (128,) moment
        # row leaves the chip per chunk (a billion-ray scan would otherwise
        # fetch ~GBs of partial blocks)
        return out.sum(axis=0)

    # cap on consecutive f32 partial-sum adds: per-chunk sums stay < 2^23, so
    # within a group the accumulator magnitude stays < 2^28 and the relative
    # reassociation loss is ~GROUP * 2^-24 ≈ 1e-6; groups are then summed on
    # the host in float64 (a flat f32 accumulator loses ~1e-5 by 128 chunks)
    GROUP = 16

    @partial(jax.jit, static_argnames=("n_local", "rows"))
    def _chunks_fused(phases_arr, kfracs_arr, n_local, rows):
        # all equal-size chunks in ONE dispatch: per-chunk host round trips
        # (~50 ms each through a tunnel) would dominate a giga-ray scan.
        # (A vmapped single pallas launch with a chunk grid dim compiles
        # pathologically on Mosaic; the fori_loop of launches is the fastest
        # working form measured.)
        n_chunks = phases_arr.shape[0]
        n_groups = -(-n_chunks // GROUP)

        def body(i, acc):
            rows_i = _chunk(phases_arr[i], kfracs_arr[i], n_local, rows)
            return acc.at[i // GROUP].add(rows_i)

        init = jnp.zeros((n_groups, LANES), jnp.float32)
        return jax.lax.fori_loop(0, n_chunks, body, init)

    moments = np.zeros(LANES, np.float64)

    full = [c for c in chunks if c[0] == CHUNK]
    rest = [c for c in chunks if c[0] != CHUNK]
    if len(full) > 1:
        phases_arr = jnp.asarray([c[1] for c in full], jnp.float32)
        kfracs_arr = jnp.asarray([c[2] for c in full], jnp.float32)
        n_pad = ((CHUNK + tile - 1) // tile) * tile
        groups = np.asarray(
            _chunks_fused(phases_arr, kfracs_arr, CHUNK, n_pad // LANES),
            np.float64,
        )
        moments += groups.sum(axis=0)  # float64 cross-group reduction
        rest = rest or []
    else:
        rest = chunks
    for n_local, phase_i, k_frac_i in rest:
        n_pad = ((n_local + tile - 1) // tile) * tile
        moments += np.asarray(
            _chunk(phase_i, k_frac_i, n_local, n_pad // LANES), np.float64
        )
    return {
        "moments": moments[: len(MOMENT_FIELDS)],
        "opl_ref": opl_ref,
        "inv_dn_chief": inv_dn_chief,
        "centre_distance": centre_distance,
    }


@jax.jit
def _fresh_predicate(alive, opl, opl_c, incidence):
    return (
        jnp.all(alive)
        & jnp.logical_not(jnp.any(opl != 0))
        & jnp.logical_not(jnp.any(opl_c != 0))
        & jnp.logical_not(jnp.any(incidence != 0))
    )


def _is_fresh(source: RayBundle) -> bool:
    """True if the bundle is straight out of a source factory: zero opl,
    zero compensation, zero incidence, all rays alive.

    The reductions run ON DEVICE and only one boolean scalar crosses to the
    host — auto-detection used to pull ~9 B/ray (alive+opl+opl_c+incidence)
    through np.asarray, which could dominate the 37 B/ray kernel it gates.
    Host-resident NumPy bundles short-circuit without any device round trip.
    """
    leaves = (source.alive, source.opl, source.opl_c, source.incidence)
    if any(isinstance(x, jax.core.Tracer) for x in leaves):
        return False  # under trace: cannot decide, stream conservatively
    if all(isinstance(x, np.ndarray) for x in leaves):
        return bool(
            np.all(leaves[0])
            and not np.any(leaves[1])
            and not np.any(leaves[2])
            and not np.any(leaves[3])
        )
    return bool(_fresh_predicate(*leaves))


def pallas_trace(
    source: RayBundle,
    elements,
    block_rows: int = BLOCK_ROWS,
    fresh: bool | None = None,
    ignore_defects: bool = True,
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
    from .warmup import note_dispatch

    note_dispatch()
    baked, maps, final, premasks = _static_chain(elements)
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
    outs = _pallas_trace_padded(tuple(comps), baked, maps, final, premasks,
                                block_rows, interpret, fresh=fresh, n_rays=n,
                                ignore_defects=ignore_defects)
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
