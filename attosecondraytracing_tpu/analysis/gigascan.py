"""Giga-ray detector images: chunked fused-source tracing + device binning.

The fused-source kernel (ops/pallas_trace.pallas_trace_source) synthesizes
and traces rays from nothing but the ray index, so the number of rays in a
"bundle" stops being bounded by memory: this module runs the spot diagram and
the spatio-temporal delay map — ART's raison d'être
(ART/ModuleAnalysisAndPlots.py:133-440) — at billions of rays by streaming
2^23-ray chunks through the kernel and accumulating device-binned histograms.
Per chunk, only the traced state transiently exists in HBM (~300 MB) and only
the O(bins^2) images persist; nothing per-ray ever reaches the host.

Delays are accumulated against a fixed chief-ray reference (not the per-chunk
mean, which would shift chunk to chunk) and re-centred to the global weighted
mean at the end — identical semantics to Detector.get_Delays at any scale.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bundle import RayBundle
from ..ops.geometry import kahan_add
from ..ops.precision import LIGHT_SPEED_MM_S
from . import stats
from .histogram import _bin_indices, binned_sums


@partial(jax.jit, static_argnames=("bins",))
def _chunk_binned_sums(bundle: RayBundle, weights, centre, normal, rot,
                       lo, hi, opl_ref, bins):
    """(w_img, wd_img) for one traced chunk: weight and weight*delay
    histograms on a FIXED extent, delays [fs] relative to ``opl_ref``."""
    xy = stats.detector_points_2d(bundle, centre, normal, rot)
    _, t = stats.detector_points_3d(bundle, centre, normal)
    s, c = kahan_add(bundle.opl, bundle.opl_c, t)
    # (s - opl_ref) is a same-magnitude cancellation (exact); the Kahan
    # compensation then applies at full significance (see stats.detector_delays)
    delay_fs = ((s - opl_ref) - c) * (1e15 / LIGHT_SPEED_MM_S)
    w = jnp.where(bundle.alive, weights, 0.0)
    ix, iy, inside = _bin_indices(xy, lo, hi, bins)
    wv = jnp.where(inside, w, 0.0)
    # MXU one-hot binning (analysis.histogram.binned_sums); default matmul
    # precision — the bf16 rounding of w/wd (~2^-8 relative, unbiased)
    # averages out in pixel sums, far below giga-ray statistical noise
    return binned_sums(ix, iy, (wv, wv * delay_fs), bins)


_PHI_FRAC = 0.3819660112501051  # golden turn fraction (ops.pallas_trace)


def _weights_c(kind, n_local, phase_i, k_frac_i, radius, pos_radius, n_each,
               n_sources, n_total, logedge):
    """Gaussian chunk weights edge**rr from the source's radial law (1.0
    when logedge is None) — jit-safe, shared by both image engines."""
    import jax.numpy as jnp

    from ..ops import pallas_trace as pt

    if logedge is None:
        return jnp.ones((n_local,), jnp.float32)
    kf = jnp.arange(n_local, dtype=jnp.float32)
    _p, _d, rr = pt.synth_source_c(
        kind, kf, n_total, radius, phase_i, k_frac_i,
        pos_radius=pos_radius, n_each=n_each, n_sources=n_sources)
    return jnp.exp(logedge * rr)


@partial(jax.jit, static_argnames=(
    "baked", "statics", "bins", "chunk", "n_total", "group", "n_groups",
    "logedge", "ignore_defects", "wavelength", "interpret"))
def _images_fused_pallas(phases_arr, kfracs_arr, centre, normal, rotj,
                         lo, hi, opl_ref, *, baked, statics, bins, chunk,
                         n_total, group, n_groups, logedge, ignore_defects,
                         wavelength, interpret=False):
    """All full chunks in ONE dispatch through the Mosaic fused-source
    kernel + matmul binning. Module-level jit: repeated calls with the same
    chain/bins/chunk-count hit the cache (a closure-level jit recompiled
    ~5 s on EVERY image — that, not the chunk math at ~40 ms/2^23 rays, was
    what round 4's 1e9-ray demo and the first round-5 A/B actually
    measured)."""
    from ..ops import pallas_trace as pt

    elements_b, maps_b, final_b, premasks_b = statics
    rows = ((chunk + pt.BLOCK_ROWS * pt.LANES - 1)
            // (pt.BLOCK_ROWS * pt.LANES)) * pt.BLOCK_ROWS

    def body(i, carry):
        wg, wdg = carry
        outs = pt._pallas_trace_source_padded(
            phases_arr[i], kfracs_arr[i], baked, elements_b, maps_b,
            final_b, premasks_b, pt.BLOCK_ROWS, interpret, chunk, n_total,
            rows, ignore_defects)
        (opx, opy, opz, odx, ody, odz, oopl, oopl_c, oalive, oinc) = outs

        def unprep(x):
            return x.reshape(-1)[:chunk]

        bundle = RayBundle(
            p=jnp.stack([unprep(opx), unprep(opy), unprep(opz)], axis=-1),
            d=jnp.stack([unprep(odx), unprep(ody), unprep(odz)], axis=-1),
            opl=unprep(oopl), opl_c=unprep(oopl_c),
            alive=unprep(oalive) != 0,
            intensity=jnp.ones((chunk,), jnp.float32),
            incidence=unprep(oinc),
            wavelength=jnp.asarray(wavelength, jnp.float32),
        )
        weights = _weights_c(baked.kind, chunk, phases_arr[i], kfracs_arr[i],
                             baked.radius, baked.pos_radius, baked.n_each,
                             baked.n_sources, n_total, logedge)
        wi, wdi = _chunk_binned_sums(bundle, weights, centre, normal, rotj,
                                     lo, hi, opl_ref, bins)
        g = i // group
        return wg.at[g].add(wi), wdg.at[g].add(wdi)

    init = (jnp.zeros((n_groups,) + bins, jnp.float32),
            jnp.zeros((n_groups,) + bins, jnp.float32))
    return jax.lax.fori_loop(0, phases_arr.shape[0], body, init)


@partial(jax.jit, static_argnames=(
    "baked", "bins", "chunk", "n_total", "group", "n_groups", "logedge",
    "ignore_defects", "wavelength"))
def _images_fused_xla(phases_arr, kfracs_arr, els_x, maps_x, final_x,
                      premasks_x, centre, normal, rotj, lo, hi, opl_ref, *,
                      baked, bins, chunk, n_total, group, n_groups, logedge,
                      ignore_defects, wavelength):
    """XLA fused-source twin of :func:`_images_fused_pallas` (geometry as
    traced inputs; takes grid-defect chains)."""
    from ..ops import pallas_trace as pt
    from ..ops import xla_source as xs

    dummy_det = pt.BakedDetector(
        centre=(0.0, 0.0, 0.0), normal=(0.0, 0.0, 1.0),
        e1=(1.0, 0.0, 0.0), e2=(0.0, 1.0, 0.0), distances=(0.0,),
        opl_ref=0.0, delay_offsets=(0.0,),
    )

    def body(i, carry):
        wg, wdg = carry
        s = xs._xla_source_run(
            els_x, maps_x, final_x, premasks_x, dummy_det, baked.kind,
            jnp.float32(baked.radius), phases_arr[i], kfracs_arr[i],
            jnp.float32(0.0), jnp.float32(0.0),
            jnp.float32(baked.pos_radius), chunk, n_total,
            baked.n_each, baked.n_sources, ignore_defects, False)
        bundle = RayBundle(
            p=jnp.stack([s.px, s.py, s.pz], axis=-1),
            d=jnp.stack([s.dx, s.dy, s.dz], axis=-1),
            opl=s.opl, opl_c=s.opl_c, alive=s.alive,
            intensity=jnp.ones((chunk,), jnp.float32),
            incidence=s.incidence,
            wavelength=jnp.asarray(wavelength, jnp.float32),
        )
        weights = _weights_c(baked.kind, chunk, phases_arr[i], kfracs_arr[i],
                             baked.radius, baked.pos_radius, baked.n_each,
                             baked.n_sources, n_total, logedge)
        wi, wdi = _chunk_binned_sums(bundle, weights, centre, normal, rotj,
                                     lo, hi, opl_ref, bins)
        g = i // group
        return wg.at[g].add(wi), wdg.at[g].add(wdi)

    init = (jnp.zeros((n_groups,) + bins, jnp.float32),
            jnp.zeros((n_groups,) + bins, jnp.float32))
    return jax.lax.fori_loop(0, phases_arr.shape[0], body, init)


def fused_source_images(
    source_spec,
    elements,
    detector,
    n_total: int | None = None,
    bins: tuple[int, int] = (512, 512),
    extent=None,
    chunk: int = 1 << 23,
    ignore_defects: bool = True,
    engine: str = "pallas",
):
    """Intensity image + mean-delay map of ``n_total`` fused-source rays.

    ``source_spec`` is a chain's FusedSourceInfo (models/chain.py);
    ``n_total`` defaults to its ray count but may be arbitrarily larger —
    the source is synthesized in-kernel, so a billion-ray image costs only
    time, not memory. Returns a dict with ``image`` (weighted intensity
    histogram), ``mean_delay`` [fs, NaN off-beam, re-centred to the global
    weighted mean], ``weight_image``, ``extent`` (lo, hi) [mm], and
    ``sum_w``.

    Both engines bin on the MXU (one-hot matmuls,
    analysis.histogram.binned_sums — TPU has no fast scatter).
    ``engine='pallas'`` (default, measured fastest: 0.80 s vs 0.97 s per
    1e8-ray 256² image, scripts/bench_image_engines.py) traces each chunk
    with the fused-source Mosaic kernel; ``engine='xla-source'`` runs
    source synthesis + chained-frame trace + binning as one XLA program
    (ops/xla_source.py machinery) and also takes grid-defect chains
    (``ignore_defects=False``), which the Mosaic kernel cannot.

    The reference's SpotDiagram/DelayGraph scatter plots
    (ART/ModuleAnalysisAndPlots.py:133-440) fetch every ray to the host;
    this streams 2^23-ray chunks through the zero-HBM-read kernel instead.
    """
    from ..ops import pallas_trace as pt
    from ..ops import xla_source as xs
    from ..ops.trace import trace

    if engine not in ("pallas", "xla-source"):
        raise ValueError('engine must be "pallas" or "xla-source"')

    baked = source_spec.baked()
    n_total = int(n_total if n_total is not None else source_spec.n_rays)
    rot = detector._plane_rotation()
    centre = jnp.asarray(detector.centre, jnp.float32)
    normal = jnp.asarray(detector.normal, jnp.float32)
    rotj = jnp.asarray(rot, jnp.float32)

    opl_ref, _, _ = pt.chief_ray_refs(baked, elements, detector.centre,
                                   detector.normal, (0.0,))

    if extent is None:
        probe = pt.source_bundle(baked, min(n_total, 1 << 17))
        pout = trace(probe, elements, keep_history=False,
                     ignore_defects=ignore_defects)
        xy = np.asarray(stats.detector_points_2d(pout, centre, normal, rotj))
        alive = np.asarray(pout.alive)
        if not alive.any():
            raise RuntimeError("no probe ray reaches the detector; cannot "
                               "auto-fit the image extent")
        lo = xy[alive].min(axis=0)
        hi = xy[alive].max(axis=0)
        mid, half = 0.5 * (lo + hi), 0.5 * (hi - lo) * 1.05 + 1e-12
        lo, hi = mid - half, mid + half
    else:
        lo, hi = np.asarray(extent[0], float), np.asarray(extent[1], float)
    lo_j = jnp.asarray(lo, jnp.float32)
    hi_j = jnp.asarray(hi, jnp.float32)

    edge = source_spec.gaussian_edge
    logedge = None if edge is None else float(np.log(edge))
    if baked.kind in ("extended", "square"):
        # chunks must align to whole sub-sources / grid rows (the offset
        # laws of pt.synth_source_c)
        chunk = max(1, chunk // baked.n_each) * baked.n_each

    def _phase_kfrac(off):
        if baked.kind == "extended":
            i0 = off // baked.n_each
            return (float(np.mod(i0 * _PHI_FRAC, 1.0)),
                    i0 / max(baked.n_sources, 1))
        if baked.kind == "square":
            return float(off // baked.n_each), 0.0  # row offset in the phase slot
        return float(np.mod(off * _PHI_FRAC, 1.0)), off / n_total

    def _weights(n_local, phase_i, k_frac_i):
        if logedge is None:
            return jnp.ones((n_local,), jnp.float32)
        kf = jnp.arange(n_local, dtype=jnp.float32)
        _p, _d, rr = pt.synth_source_c(
            baked.kind, kf, n_total, baked.radius, phase_i, k_frac_i,
            pos_radius=baked.pos_radius, n_each=baked.n_each,
            n_sources=baked.n_sources)
        return jnp.exp(logedge * rr)

    # per-chunk tracer, engine-selected; both return a lab-frame RayBundle
    # with traced scalars allowed for (phase, k_frac)
    if engine == "xla-source":
        els_x, maps_x, final_x, premasks_x = xs._source_inputs(baked, elements)
        dummy_det = pt.BakedDetector(
            centre=(0.0, 0.0, 0.0), normal=(0.0, 0.0, 1.0),
            e1=(1.0, 0.0, 0.0), e2=(0.0, 1.0, 0.0), distances=(0.0,),
            opl_ref=0.0, delay_offsets=(0.0,),
        )
        wl = jnp.asarray(source_spec.wavelength, jnp.float32)

        def _trace_chunk(n_local, phase_i, k_frac_i):
            s = xs._xla_source_run(
                els_x, maps_x, final_x, premasks_x, dummy_det, baked.kind,
                jnp.float32(baked.radius), phase_i, k_frac_i,
                jnp.float32(0.0), jnp.float32(0.0),
                jnp.float32(baked.pos_radius), n_local, n_total,
                baked.n_each, baked.n_sources, ignore_defects, False)
            ones = jnp.ones((n_local,), jnp.float32)
            return RayBundle(
                p=jnp.stack([s.px, s.py, s.pz], axis=-1),
                d=jnp.stack([s.dx, s.dy, s.dz], axis=-1),
                opl=s.opl, opl_c=s.opl_c, alive=s.alive, intensity=ones,
                incidence=s.incidence, wavelength=wl,
            )
    else:
        def _trace_chunk(n_local, phase_i, k_frac_i):
            return pt.pallas_trace_source(
                baked, elements, n_local,
                wavelength=source_spec.wavelength,
                phase=phase_i, k_frac=k_frac_i,
                n_total=n_total, ignore_defects=ignore_defects,
            )

    # cross-group accumulation on host in float64: pixel weights can exceed
    # the f32 integer range (2^24) on giga-ray scans
    w_img = np.zeros(bins, np.float64)
    wd_img = np.zeros(bins, np.float64)

    # all FULL chunks run in ONE dispatch: a fori_loop of kernel launches +
    # device binning, group-partitioned f32 accumulators (<= GROUP chunks per
    # group keeps pixel sums < 2^26, ~1e-6 relative reassociation), groups
    # summed on the host in f64. The round-3 loop fetched each chunk's image
    # through the ~25-50 ms tunnel — ~120 sequential round trips per 1e9 rays
    # that dominated the ~2 ms kernel (VERDICT r3 #4). Mirrors the moments
    # path's fused dispatch (ops/pallas_trace.pallas_source_detector_moments).
    GROUP = 8
    offs = list(range(0, n_total - chunk + 1, chunk))
    rest_off = len(offs) * chunk

    if len(offs) > 1:
        pk = [_phase_kfrac(o) for o in offs]
        phases = jnp.asarray([p for p, _ in pk], jnp.float32)
        kfracs = jnp.asarray([k for _, k in pk], jnp.float32)
        n_groups = -(-len(offs) // GROUP)
        common = dict(baked=baked, bins=bins, chunk=chunk, n_total=n_total,
                      group=GROUP, n_groups=n_groups, logedge=logedge,
                      ignore_defects=ignore_defects,
                      wavelength=float(source_spec.wavelength))
        if engine == "xla-source":
            wg, wdg = _images_fused_xla(
                phases, kfracs, els_x, maps_x, final_x, premasks_x,
                centre, normal, rotj, lo_j, hi_j, jnp.float32(opl_ref),
                **common)
        else:
            statics = pt._source_maps(baked, elements)
            wg, wdg = _images_fused_pallas(
                phases, kfracs, centre, normal, rotj, lo_j, hi_j,
                jnp.float32(opl_ref), statics=statics,
                interpret=jax.default_backend() == "cpu", **common)
        w_img += np.asarray(wg, np.float64).sum(axis=0)
        wd_img += np.asarray(wdg, np.float64).sum(axis=0)
    elif offs:
        rest_off = 0  # single full chunk: take the remainder path below

    # remainder (and the single-chunk case): per-chunk dispatch
    off = rest_off
    while off < n_total:
        n_local = min(chunk, n_total - off)
        phase_i, k_frac_i = _phase_kfrac(off)
        bundle = _trace_chunk(n_local, jnp.float32(phase_i),
                              jnp.float32(k_frac_i))
        weights = _weights(n_local, jnp.float32(phase_i), jnp.float32(k_frac_i))
        wi, wdi = _chunk_binned_sums(bundle, weights, centre, normal, rotj,
                                     lo_j, hi_j, jnp.float32(opl_ref), bins)
        w_img += np.asarray(wi, np.float64)
        wd_img += np.asarray(wdi, np.float64)
        off += n_local

    w_np = w_img
    wd_np = wd_img
    sum_w = w_np.sum()
    global_mean = wd_np.sum() / max(sum_w, 1e-30)
    mean_delay = np.where(w_np > 0, wd_np / np.where(w_np > 0, w_np, 1.0) - global_mean,
                          np.nan)
    return {
        "image": w_np,
        "mean_delay": mean_delay,
        "weight_image": w_np,
        "extent": (lo, hi),
        "sum_w": sum_w,
        "n_total": n_total,
    }
