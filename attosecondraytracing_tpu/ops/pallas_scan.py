"""Runtime-scalar-pose fused scan engine (VERDICT r3 #1).

The production Pallas kernels (ops/pallas_trace.py) bake chain geometry as
compile-time constants: excellent for one big trace, but a *parameter scan*
(the reference's flagship workflow — ``get_OE_loop_list`` / OEPlacement
distance scans / Monte-Carlo tolerancing, ART/ARTmain.py:326-332 +
ART/ModuleOpticalChain.py:371-657) would recompile the Mosaic kernel once per
chain. This module generalizes the mechanism proven by the gradient engine
(ops/pallas_grad.py:92-144): everything *pose-dependent* — the chained-frame
affine maps, the source fold, and the detector plane — moves into a small
runtime scalar vector in SMEM, while everything pose-independent (surface
shapes, supports, Zernike coefficients, the Vogel source law) stays baked.

A structurally-uniform scan then runs every chain through the SAME compiled
kernel: per chain only ~12*K + 12 pose scalars and a handful of auxiliary
scalars (chief-ray reference path, Gaussian weight coefficient, spiral
chunk offsets) change. No re-bake, no recompile, no stacked gigabyte source
bundles — the kernel synthesizes each chain's source in-kernel and reduces
straight to the 16 distance-independent detector moments
(ops/pallas_trace.MOMENT_FIELDS), so an 11-chain 1e7-ray scan is ~22 kernel
launches after ONE compile.

Scalar-vector layout (``svec``, float32): ops/pallas_grad.chain_scalars —
per element the composed affine (9 + 3), then the detector plane in the
final element's frame (centre, normal, e1, e2). Auxiliary vector (``aux``):
[opl_ref, inv_dn_chief, centre_distance, source_radius, weight_coeff,
phase, k_frac, pos_radius] where ``weight_coeff = ln(gaussian_edge)`` (the
weight is edge**rr with rr the normalized radial law of
ops/pallas_trace.synth_source_c; 0 = uniform) and (phase, k_frac) are the
> 2^23-ray chunk offsets of the global Vogel spiral.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_trace as pt
from .pallas_grad import _unpack_scalars, chain_scalars, n_scalars
from .trace import TraceState, chained_step

N_AUX = 8
(AUX_OPL_REF, AUX_INV_DN, AUX_CENTRE_D, AUX_RADIUS, AUX_WCOEF, AUX_PHASE,
 AUX_KFRAC, AUX_POS_RADIUS) = range(N_AUX)


class ScanSpec(NamedTuple):
    """Static (hashable) description of a scan's *shared* structure: one
    compile covers every chain whose pose-independent parts match this.

    ``elements`` are baked via pt._static_elements from ONE representative
    chain — their rot/position leaves are unused (poses come from the runtime
    scalars); only centre/surface/support/defects matter and those are
    pose-independent across a scan."""

    source_kind: str   # 'cone' | 'disk' | 'extended' | 'square'
    elements: tuple    # pt._static_elements output
    n_total: int       # global ray count (radius law divisor)
    ignore_defects: bool
    block_rows: int
    n_each: int = 0    # cone rays per sub-source ('extended')
    n_sources: int = 0


def make_scan_spec(source_kind: str, elements, n_total: int,
                   ignore_defects: bool = True,
                   block_rows: int = pt.MOMENT_BLOCK_ROWS,
                   n_each: int = 0, n_sources: int = 0) -> ScanSpec:
    return ScanSpec(
        source_kind=source_kind,
        elements=pt._static_elements(elements),
        n_total=int(n_total),
        ignore_defects=bool(ignore_defects),
        block_rows=int(block_rows),
        n_each=int(n_each),
        n_sources=int(n_sources),
    )


def _kernel_scan_moments(svec, aux, out, *, spec: ScanSpec, n_rays: int):
    """Synthesize the chain's slice of the global Vogel source from the ray
    index, trace it through the runtime affine maps, reduce to the 16 moment
    sums — the runtime-scalar twin of pt._kernel_source_moments."""
    block_rows = spec.block_rows
    shape = (block_rows, pt.LANES)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    idx = (pl.program_id(0) * block_rows + rows) * pt.LANES + lanes
    kf = idx.astype(jnp.float32)

    (px, py, pz), (dx, dy, dz), rr = pt.synth_source_c(
        spec.source_kind, kf, spec.n_total, aux[AUX_RADIUS], aux[AUX_PHASE],
        aux[AUX_KFRAC], pos_radius=aux[AUX_POS_RADIUS], n_each=spec.n_each,
        n_sources=spec.n_sources)
    zeros = jnp.zeros(shape, dtype=jnp.float32)
    # Gaussian source profile edge**rr (rr = the normalized radial law);
    # weight_coeff = ln(edge), 0 gives exactly 1.0 (uniform) with no
    # separate compile
    weights = jnp.exp(aux[AUX_WCOEF] * rr)
    s = TraceState(
        px=px + zeros, py=py + zeros, pz=pz + zeros,
        dx=dx + zeros, dy=dy + zeros, dz=dz + zeros,
        opl=zeros, opl_c=zeros,
        alive=idx < n_rays,
        incidence=zeros,
    )
    n_el = len(spec.elements)
    scal = tuple(svec[i] for i in range(n_scalars(n_el)))
    maps, det_rel = _unpack_scalars(scal, n_el)
    for el, (M, b) in zip(spec.elements, maps):
        # moments epilogue masks dead rays: skip their freeze selects
        s = chained_step(el, M, b, s, want_incidence=False,
                         ignore_defects=spec.ignore_defects,
                         freeze_dead=False)
    det = pt.BakedDetector(
        centre=det_rel[0], normal=det_rel[1], e1=det_rel[2], e2=det_rel[3],
        distances=(0.0,), opl_ref=aux[AUX_OPL_REF],
        inv_dn_chief=aux[AUX_INV_DN],
    )
    out[:] = pt.moment_rows(s, det, weights,
                            centre_distance=aux[AUX_CENTRE_D])


@partial(jax.jit, static_argnames=("spec", "interpret", "n_rays", "rows"))
def _pallas_scan_moments_padded(svec, aux, spec, interpret, n_rays, rows):
    if n_rays >= 1 << 24:
        raise ValueError("per-call ray count must stay < 2^24 (float index "
                         "exactness); chunk larger ranges")
    grid = (rows // spec.block_rows,)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    rowspec = pl.BlockSpec((8, pt.LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = partial(_kernel_scan_moments, spec=spec, n_rays=n_rays)
    n_programs = rows // spec.block_rows
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[sspec, sspec],
        out_specs=rowspec,
        out_shape=jax.ShapeDtypeStruct((n_programs * 8, pt.LANES), jnp.float32),
        interpret=interpret,
    )(svec, aux)


def scan_chain_scalars(elements, source_rot, source_origin, det_centre,
                       det_normal, det_rot):
    """Per-chain pose scalar vector (float32 NumPy): the float64 host-NumPy
    scalarization (ops/pallas_grad.chain_scalars_np — same layout the
    gradient kernel uses), evaluated on actual device-element pose leaves.
    Composing in f64 on the HOST matters: the affine offsets ``b`` need the
    same composition precision the baked kernels get from
    trace.compose_chain, and host math avoids eager device round trips."""
    from .pallas_grad import chain_scalars_np

    return chain_scalars_np(elements, source_rot, source_origin,
                            det_centre, det_normal, det_rot)


def scan_moments(
    spec: ScanSpec,
    svec,
    n_rays: int,
    opl_ref: float,
    inv_dn_chief: float,
    centre_distance: float = 0.0,
    radius: float = 0.0,
    gaussian_edge: float | None = None,
    phase: float = 0.0,
    k_frac: float = 0.0,
    pos_radius: float = 0.0,
):
    """The 16 weighted detector moments (float64, pt.MOMENT_FIELDS order) of
    one chain of the scan — same contract as
    pt.pallas_source_detector_moments but with every pose a runtime scalar.
    Chunked beyond 2^23 rays with the (phase, k_frac) spiral-offset law."""
    from .warmup import note_dispatch

    note_dispatch()
    centre_distance = float(np.float32(centre_distance))
    # weight = edge**rr with rr the normalized radial law (synth_source_c)
    wcoef = 0.0 if gaussian_edge is None else float(np.log(gaussian_edge))
    interpret = jax.default_backend() == "cpu"
    tile = spec.block_rows * pt.LANES
    svec = jnp.asarray(svec, jnp.float32)

    CHUNK = 1 << 23
    chunks = pt.source_chunks(spec.source_kind, n_rays, spec.n_total,
                              spec.n_each, spec.n_sources, CHUNK,
                              float(phase), float(k_frac))
    moments = np.zeros(pt.LANES, np.float64)
    for n_local, phase_i, k_frac_i in chunks:
        aux = jnp.asarray(
            [opl_ref, inv_dn_chief, centre_distance, radius, wcoef,
             phase_i, k_frac_i, pos_radius], jnp.float32)
        n_pad = ((n_local + tile - 1) // tile) * tile
        out = _pallas_scan_moments_padded(svec, aux, spec, interpret,
                                          n_local, n_pad // pt.LANES)
        # reduce per-program partials on device; fetch one (128,) row/chunk
        moments += np.asarray(out.sum(axis=0), np.float64)
    return moments[: len(pt.MOMENT_FIELDS)]


def _scan_mesh(spec: ScanSpec, n_rays: int):
    """Optional ('rays',) mesh for the scan engine: set ART_TPU_SCAN_MESH=1
    on a multi-device host to shard every scan-kernel pass over all devices
    (parallel.mesh.scan_moments_sharded — rays split across the mesh, the
    shared runtime-scalar kernel compiled once, one 128-float moment row
    shipped per device per chain). Returns None (single-device path) when
    unset, on one device, for 'extended'/'square' kinds (shard alignment),
    or when the ray count does not divide."""
    import os

    if os.environ.get("ART_TPU_SCAN_MESH", "0") != "1":
        return None
    devices = jax.devices()
    if (len(devices) < 2 or spec.source_kind in ("extended", "square")
            or n_rays % len(devices)):
        return None
    return jax.sharding.Mesh(np.asarray(devices), ("rays",))


def make_moments_fn(spec: ScanSpec, elements, source_info, n_rays: int):
    """Build the per-chain ``moments_fn`` consumed by
    analysis.optimizer.FindOptimalDistancePallas: a closure over THIS chain's
    device elements and fused-source description that evaluates the shared
    runtime-scalar kernel (no recompile across chains of the same ScanSpec).

    ``source_info`` is the chain's models.chain.FusedSourceInfo. With
    ART_TPU_SCAN_MESH=1 on a multi-device host the kernel pass shards the
    ray axis over all devices (see :func:`_scan_mesh`)."""
    baked_src = source_info.baked()
    src_rot = np.asarray(baked_src.rot, np.float64)
    src_origin = np.asarray(baked_src.origin, np.float64)
    radius = float(baked_src.radius)
    pos_radius = float(baked_src.pos_radius)
    mesh = _scan_mesh(spec, n_rays)

    def moments_fn(det_centre, det_normal, det_rot, gaussian_edge=None,
                   centre_distance=0.0):
        opl_ref, _offsets, inv_dn_chief = pt.chief_ray_refs(
            baked_src, elements, det_centre, det_normal, (0.0,)
        )
        svec = scan_chain_scalars(elements, src_rot, src_origin,
                                  det_centre, det_normal, det_rot)
        if mesh is not None:
            from ..parallel.mesh import scan_moments_sharded

            moments = scan_moments_sharded(
                spec, svec, n_rays, mesh, opl_ref, inv_dn_chief,
                centre_distance=centre_distance, radius=radius,
                gaussian_edge=gaussian_edge, pos_radius=pos_radius,
            )
        else:
            moments = scan_moments(
                spec, svec, n_rays, opl_ref, inv_dn_chief,
                centre_distance=centre_distance, radius=radius,
                gaussian_edge=gaussian_edge, pos_radius=pos_radius,
            )
        return {
            "moments": moments,
            "opl_ref": opl_ref,
            "inv_dn_chief": inv_dn_chief,
            "centre_distance": float(np.float32(centre_distance)),
        }

    return moments_fn


def pose_independent_signature(elements):
    """Hashable signature of everything the ScanSpec bakes: element kinds,
    support/surface shapes, centres, defects — the parts that must MATCH
    across every chain of a scan for one compiled kernel to serve them all
    (poses are runtime scalars and may differ freely)."""
    from .trace import MaskElement

    sig = []
    for el in pt._static_elements(elements):
        if isinstance(el, MaskElement):
            sig.append(("mask", el.support))
        else:
            sig.append(("mirror", el.centre, el.surface, el.support, el.defects))
    return tuple(sig)


def total_source_weight(n_rays: int, gaussian_edge: float | None,
                        n_each: int = 0, n_sources: int = 0,
                        kind: str | None = None) -> float:
    """Closed-form total source weight Sum_k exp(ln(edge) * rr_k) — the
    transmission denominator for fused scans. For plain spirals rr_k = k/n
    (geometric series, O(1) at any ray count); for extended sources every
    sub-source emits the identical cone, so the total is n_sources times
    the per-cone series; for 'square' grids the corner-normalized law
    edge**((x²+y²)/(L²/2)) separates into a product of two identical
    O(n_side) 1-D sums."""
    if gaussian_edge is None:
        return float(n_rays)
    if kind == "square":
        n_side = n_each
        # normalized coordinates x/L in [-1/2, 1/2]; rr = 2 (x/L)² + 2 (y/L)²
        xs = (np.linspace(-0.5, 0.5, n_side) if n_side > 1
              else np.array([-0.5]))
        s = float(np.exp(np.log(gaussian_edge) * 2.0 * xs * xs).sum())
        return s * s
    if n_each:
        return n_sources * total_source_weight(n_each, gaussian_edge)
    c = float(np.log(gaussian_edge) / n_rays)
    # sum_{k=0}^{n-1} e^{ck} = (e^{cn} - 1) / (e^c - 1)
    return float(np.expm1(c * n_rays) / np.expm1(c))
