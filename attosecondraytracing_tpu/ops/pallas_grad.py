"""Differentiable fused engine: alignment gradients through the Pallas
trace->stats kernel (VERDICT r2 #2).

The alignment loss (analysis/alignment.py focus_loss) is a scalar function of
the detector *statistics* — weighted moments of impact points and delays —
which the fused stats kernel (ops/pallas_trace.pallas_source_detector_stats)
already reduces in one pass with O(1) HBM traffic. The missing piece was a
gradient: the kernels bake chain geometry as compile-time constants, so
reverse-mode AD cannot reach the alignment parameters.

Design (TPU-first, not a port — the reference has no gradients at all):

* the pose-dependent geometry (the chained-frame affine maps ``(M_k, b_k)``
  and the detector plane expressed in the final element's frame) moves from
  baked constants to a small **runtime scalar vector** in SMEM (~12K + 12
  floats). Everything pose-independent (surface shapes, supports, Zernike
  coefficients, the Vogel source law) stays baked.
* that scalar vector is produced from the alignment parameters by a plain
  differentiable jnp function (:func:`chain_scalars`) — rotation composition,
  frame folding, detector re-expression; a few hundred FLOPs.
* the kernel evaluates the statistics AND their directional derivative in one
  pass with **in-kernel forward-mode AD**: the body calls ``jax.jvp`` through
  trace + epilogue (pure jnp, so the JVP is just more VPU arithmetic). One
  pass per alignment parameter gives the full Jacobian of the 7 statistics;
  the loss gradient is then one tiny host-side contraction.

Why forward-mode: alignment has few parameters (6 per element) but arbitrarily
many rays. Reverse-mode stores O(N_rays) residuals per element (GBs at 1e8+
rays); forward-mode stores nothing — gradient memory is O(1) and a billion-ray
alignment gradient costs P fused passes. Target semantics match
analysis/alignment.py:focus_loss (spot variance + weighted duration variance
+ survival penalty).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.flatten_util  # registers jax.flatten_util.ravel_pytree
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_trace as pt
from .precision import LIGHT_SPEED_MM_S
from .trace import MaskElement, MirrorElement, TraceState, chained_step


class FusedLossSpec(NamedTuple):
    """Static (hashable) description of a fused differentiable loss: the
    pose-independent parts of the chain + source + detector + loss weights."""

    source_kind: str          # 'cone' | 'disk'
    source_radius: float      # tan(divergence) or disk radius [mm]
    elements: tuple           # baked elements (pt._static_elements output)
    element_kinds: tuple      # 'mirror' | 'mask' per element
    opl_ref: float
    gaussian_edge: float | None
    n_rays: int
    duration_weight: float
    survival_weight: float
    ignore_defects: bool


# ---------------------------------------------------------------------------
# differentiable host-side scalarization (pose -> runtime kernel scalars)
# ---------------------------------------------------------------------------


def compose_chain_jnp(rots, positions, centres):
    """Differentiable version of trace.compose_chain: per-element composed
    affine maps from traced pose arrays. ``rots[k]`` is the lab->optic
    rotation (3,3), ``positions[k]`` the element centre in lab, ``centres[k]``
    the (pose-independent) support-centre point in optic coordinates."""
    maps = []
    for k in range(len(rots)):
        R = rots[k]
        if k == 0:
            M = R
            b = -R @ positions[0] + centres[0]
        else:
            M = R @ rots[k - 1].T
            b = R @ (positions[k - 1] - positions[k]) + centres[k]
        maps.append((M, b))
    final = (rots[-1], positions[-1])
    return maps, final


def chain_scalars(elements, source_rot, source_origin, det_centre, det_normal,
                  det_rot):
    """Flat (n_scalars,) array of every pose-dependent kernel constant, as a
    differentiable function of the elements' ``rot``/``position`` leaves.

    Layout: per element k the composed map ``M_k`` (9, row-major) then
    ``b_k`` (3); then the detector in the final frame: centre (3), normal
    (3), e1 (3), e2 (3). The first element's map has the source frame folded
    in (pt._source_maps semantics: canonical source coords -> element 0
    surface frame)."""
    rots = [jnp.asarray(el.rot) for el in elements]
    poss = [jnp.asarray(el.position) for el in elements]
    cens = [
        jnp.asarray(el.centre) if isinstance(el, MirrorElement) else jnp.zeros(3)
        for el in elements
    ]
    maps, (R_K, pos_K) = compose_chain_jnp(rots, poss, cens)
    Rs = jnp.asarray(source_rot)
    origin = jnp.asarray(source_origin)
    M0, _b0 = maps[0]
    maps[0] = (M0 @ Rs, M0 @ (origin - poss[0]) + cens[0])
    parts = []
    for M, b in maps:
        parts.append(M.reshape(-1))
        parts.append(b)
    c_rel = R_K @ (jnp.asarray(det_centre) - pos_K)
    n_rel = R_K @ jnp.asarray(det_normal)
    rot = jnp.asarray(det_rot)
    parts += [c_rel, n_rel, R_K @ rot[0], R_K @ rot[1]]
    return jnp.concatenate(parts).astype(jnp.float32)


def _unpack_scalars(scal, n_elements):
    """Kernel-side inverse of chain_scalars: nested tuples of 0-d values
    (chained_step and the epilogue index them like baked constants)."""
    maps = []
    i = 0
    for _ in range(n_elements):
        M = tuple(tuple(scal[i + 3 * r + c] for c in range(3)) for r in range(3))
        b = tuple(scal[i + 9 + c] for c in range(3))
        maps.append((M, b))
        i += 12
    det = tuple(
        tuple(scal[i + 3 * g + c] for c in range(3)) for g in range(4)
    )  # centre, normal, e1, e2
    return maps, det


N_DET_SCALARS = 12


def n_scalars(n_elements: int) -> int:
    return 12 * n_elements + N_DET_SCALARS


# ---------------------------------------------------------------------------
# the JVP stats kernel
# ---------------------------------------------------------------------------


def _stats_of_scalars(scal_tuple, spec: FusedLossSpec, kf, idx, block_rows):
    """Statistics rows as a pure function of the runtime scalar tuple —
    the function the kernel JVPs through."""
    maps, det_rel = _unpack_scalars(scal_tuple, len(spec.elements))
    shape = (block_rows, pt.LANES)
    cx, cy = pt._vogel_xy_c(kf, spec.n_rays, spec.source_radius, 0.0, 0.0)
    zeros = jnp.zeros(shape, dtype=jnp.float32)
    ones = jnp.ones(shape, dtype=jnp.float32)
    if spec.source_kind == "cone":
        inv = jax.lax.rsqrt(cx * cx + cy * cy + 1.0)
        px, py, pz = zeros, zeros, zeros
        dx, dy, dz = cx * inv, cy * inv, inv
    else:
        px, py, pz = cx, cy, zeros
        dx, dy, dz = zeros, zeros, ones
    if spec.gaussian_edge is None:
        weights = ones
    else:
        rr = (cx * cx + cy * cy) * (1.0 / spec.source_radius**2)
        weights = jnp.exp(float(np.log(spec.gaussian_edge)) * rr)
    s = TraceState(
        px=px, py=py, pz=pz, dx=dx, dy=dy, dz=dz,
        opl=zeros, opl_c=zeros,
        alive=idx < spec.n_rays,
        incidence=zeros,
    )
    for el, (M, b) in zip(spec.elements, maps):
        s = chained_step(el, M, b, s, want_incidence=False,
                         ignore_defects=spec.ignore_defects)
    det = pt.BakedDetector(
        centre=det_rel[0], normal=det_rel[1], e1=det_rel[2], e2=det_rel[3],
        distances=(0.0,), opl_ref=spec.opl_ref, delay_offsets=(0.0,),
    )
    rows = pt.stats_rows(s, det, weights)
    return tuple(rows[name] for name in pt.STATS_FIELDS)


def _kernel_stats_jvp(sprimal, stangent, *outs, spec, block_rows):
    shape = (block_rows, pt.LANES)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    idx = (pl.program_id(0) * block_rows + rows) * pt.LANES + lanes
    kf = idx.astype(jnp.float32)

    n = n_scalars(len(spec.elements))
    primal = tuple(sprimal[i] for i in range(n))
    tangent = tuple(stangent[i] for i in range(n))
    f = partial(_stats_of_scalars, spec=spec, kf=kf, idx=idx,
                block_rows=block_rows)
    p_rows, t_rows = jax.jvp(f, (primal,), (tangent,))
    for ref, val in zip(outs, tuple(p_rows) + tuple(t_rows)):
        ref[:] = val


def _kernel_stats_primal(sprimal, *outs, spec, block_rows):
    shape = (block_rows, pt.LANES)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    idx = (pl.program_id(0) * block_rows + rows) * pt.LANES + lanes
    kf = idx.astype(jnp.float32)
    n = n_scalars(len(spec.elements))
    primal = tuple(sprimal[i] for i in range(n))
    p_rows = _stats_of_scalars(primal, spec, kf, idx, block_rows)
    for ref, val in zip(outs, p_rows):
        ref[:] = val


@partial(jax.jit, static_argnames=("spec", "block_rows", "interpret", "rows",
                                   "with_tangent"))
def _stats_params_padded(sprimal, stangent, spec, block_rows, interpret, rows,
                         with_tangent=True):
    grid = (rows // block_rows,)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    rowspec = pl.BlockSpec((8, pt.LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    n_programs = rows // block_rows
    n_stats = len(pt.STATS_FIELDS)
    n_out = 2 * n_stats if with_tangent else n_stats
    out_shape = tuple(
        jax.ShapeDtypeStruct((n_programs * 8, pt.LANES), jnp.float32)
        for _ in range(n_out)
    )
    if with_tangent:
        kernel = partial(_kernel_stats_jvp, spec=spec, block_rows=block_rows)
        args = (sprimal, stangent)
        in_specs = [sspec, sspec]
    else:
        kernel = partial(_kernel_stats_primal, spec=spec, block_rows=block_rows)
        args = (sprimal,)
        in_specs = [sspec]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple([rowspec] * n_out),
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    # reduce per-program partials on device; only scalars leave the chip
    return jnp.stack([o.sum(axis=0)[0] for o in outs])  # (n_out,) lane 0 = distance 0


# ---------------------------------------------------------------------------
# public API: fused loss value + gradient
# ---------------------------------------------------------------------------


def _loss_from_stats(stats, spec: FusedLossSpec, total_weight):
    """focus_loss from the 7 weighted moments (analysis/alignment.py:74-104
    semantics): spot variance + duration_weight * delay variance [fs^2] +
    survival_weight * (1 - transmission)."""
    w, wx, wy, wxx, wyy, wd, wdd = stats
    w = jnp.maximum(w, 1e-30)
    var_x = wxx / w - (wx / w) ** 2
    var_y = wyy / w - (wy / w) ** 2
    loss = var_x + var_y
    if spec.duration_weight:
        to_fs = 1e15 / LIGHT_SPEED_MM_S
        var_d = (wdd / w - (wd / w) ** 2) * to_fs**2
        loss = loss + spec.duration_weight * var_d
    if spec.survival_weight:
        loss = loss + spec.survival_weight * (1.0 - w / total_weight)
    return loss


def make_loss_spec(
    source_spec,
    elements,
    det_centre,
    det_normal,
    duration_weight: float = 0.0,
    survival_weight: float = 1.0,
    ignore_defects: bool = True,
) -> FusedLossSpec:
    """Build the static FusedLossSpec from a chain's FusedSourceInfo
    (models/chain.py), its device elements, and the (fixed, lab-frame)
    detector plane."""
    baked_src = source_spec.baked()
    opl_ref, _, _ = pt.chief_ray_refs(baked_src, elements, det_centre, det_normal, (0.0,))
    kinds = tuple(
        "mask" if isinstance(el, MaskElement) else "mirror" for el in elements
    )
    return FusedLossSpec(
        source_kind=source_spec.kind,
        source_radius=float(np.tan(source_spec.param)) if source_spec.kind == "cone"
        else float(source_spec.param),
        elements=pt._static_elements(elements),
        element_kinds=kinds,
        opl_ref=float(opl_ref),
        gaussian_edge=source_spec.gaussian_edge,
        n_rays=int(source_spec.n_rays),
        duration_weight=float(duration_weight),
        survival_weight=float(survival_weight),
        ignore_defects=bool(ignore_defects),
    )


def fused_focus_value_and_grad(
    params,
    spec: FusedLossSpec,
    elements,
    source_rot,
    source_origin,
    det_centre,
    det_normal,
    det_rot,
    block_rows: int = pt.BLOCK_ROWS,
):
    """(loss, grad) of the focus loss w.r.t. the AlignmentParams pytree,
    computed entirely through the fused Pallas engine.

    ``elements`` are the *unperturbed* device elements (jnp/NumPy leaves);
    poses are perturbed by ``params`` on the fly (alignment.apply_params).
    One JVP kernel pass per parameter: P = 6 * n_elements passes, O(1)
    memory at ANY ray count (reverse-mode through the XLA trace needs
    O(N_rays) residuals). Ray count must stay < 2^24 per call (the fused
    kernels' float-index limit); shard or chunk beyond that."""
    from ..analysis.alignment import apply_params

    if spec.n_rays >= 1 << 24:
        raise ValueError("fused gradients support < 2^24 rays per call")

    def scalars_of(p):
        perturbed = apply_params(elements, p)
        return chain_scalars(perturbed, source_rot, source_origin,
                             det_centre, det_normal, det_rot)

    flat_params, unravel = jax.flatten_util.ravel_pytree(params)
    P = flat_params.shape[0]
    tile = block_rows * pt.LANES
    n_pad = ((spec.n_rays + tile - 1) // tile) * tile
    rows = n_pad // pt.LANES
    interpret = jax.default_backend() == "cpu"

    def scal_flat(fp):
        return scalars_of(unravel(fp))

    sprimal = scal_flat(flat_params)
    n_stats = len(pt.STATS_FIELDS)

    # total source weight for the survival term (closed form on device)
    if spec.gaussian_edge is None:
        total_weight = float(spec.n_rays)
    else:
        kf = jnp.arange(spec.n_rays, dtype=jnp.float32)
        rr = kf * (1.0 / spec.n_rays)  # r^2/R^2 of the Vogel radius law
        total_weight = float(jnp.sum(jnp.exp(float(np.log(spec.gaussian_edge)) * rr)))

    grads = jnp.zeros((P,), jnp.float32)
    loss = None
    for p_idx in range(P):
        e_p = jnp.zeros((P,), jnp.float32).at[p_idx].set(1.0)
        _, stangent = jax.jvp(scal_flat, (flat_params,), (e_p,))
        out = _stats_params_padded(sprimal, stangent, spec, block_rows,
                                   interpret, rows, with_tangent=True)
        p_stats, t_stats = out[:n_stats], out[n_stats:]
        if loss is None:
            loss, dloss_dstats = jax.value_and_grad(
                lambda st: _loss_from_stats(tuple(st), spec, total_weight)
            )(p_stats)
        grads = grads.at[p_idx].set(jnp.vdot(dloss_dstats, t_stats))
    return loss, unravel(grads)


def fused_focus_loss(params, spec: FusedLossSpec, elements, source_rot,
                     source_origin, det_centre, det_normal, det_rot,
                     block_rows: int = pt.BLOCK_ROWS):
    """Loss only (one primal kernel pass — for line searches / evaluation)."""
    from ..analysis.alignment import apply_params

    def scalars_of(p):
        perturbed = apply_params(elements, p)
        return chain_scalars(perturbed, source_rot, source_origin,
                             det_centre, det_normal, det_rot)

    tile = block_rows * pt.LANES
    n_pad = ((spec.n_rays + tile - 1) // tile) * tile
    rows = n_pad // pt.LANES
    interpret = jax.default_backend() == "cpu"
    sprimal = scalars_of(params)
    stats = _stats_params_padded(sprimal, sprimal, spec, block_rows,
                                 interpret, rows, with_tangent=False)
    if spec.gaussian_edge is None:
        total_weight = float(spec.n_rays)
    else:
        kf = jnp.arange(spec.n_rays, dtype=jnp.float32)
        rr = kf * (1.0 / spec.n_rays)
        total_weight = float(jnp.sum(jnp.exp(float(np.log(spec.gaussian_edge)) * rr)))
    return _loss_from_stats(tuple(stats), spec, total_weight)
