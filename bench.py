"""Headline benchmark: rays/s through the 2-toroidal grazing-incidence chain.

BASELINE.md target: >= 1e9 rays/s/chip through a 2-element toroidal chain
with a 1e7-ray bundle (the reference traces ~1e3 rays in seconds-level pure
Python). Prints ONE JSON line:
  {"metric": "rays_per_second", "value": N, "unit": "rays/s", "vs_baseline": N/1e9}
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


DIVERGENCE = 50e-3 / 2  # flagship source half-DIVERGENCE [rad]
WAVELENGTH = 80e-6      # [mm]


def build(n_rays: int):
    from __graft_entry__ import _flagship_chain, _to_f32

    chain = _flagship_chain(n_rays)
    return _to_f32(chain.source_rays), _to_f32(chain.device_elements())


def build_device(n_rays: int):
    """Flagship chain with the source bundle synthesized *on device*: the
    Vogel-spiral cone is pure math from arange, so there is no reason to
    build 400 MB on the host and push it through the (slow, shared) TPU
    tunnel. Elements stay as host NumPy (they enter jit as baked constants or
    one packed transfer; per-leaf device_put costs one tunnel RPC per tiny
    leaf)."""
    from __graft_entry__ import _flagship_chain, _to_f32
    from attosecondraytracing_tpu.ops.bundle import RayBundle

    chain = _flagship_chain(16)  # placement/elements only
    elements = _to_f32(chain.device_elements())

    @jax.jit
    def make_source():
        dt = jnp.float32
        k = jnp.arange(n_rays, dtype=dt)
        golden = np.pi * (3.0 - np.sqrt(5.0))
        r = jnp.sqrt(k / n_rays) * np.tan(DIVERGENCE)
        th = golden * k
        # cone around +z, then rotate z->x (the flagship source axis)
        cx = r * jnp.cos(th)
        cy = r * jnp.sin(th)
        inv = jax.lax.rsqrt(cx * cx + cy * cy + 1.0)
        # rotation z->x maps (x,y,z) -> (z, y, -x)
        d = jnp.stack([inv, cy * inv, -cx * inv], axis=-1)
        # Gaussian intensity vs angle, 1/e^2 at the edge (tan(angle) = r)
        ang = jnp.arctan(r)
        intensity = jnp.exp((jnp.tan(ang) / np.tan(DIVERGENCE)) ** 2 * np.log(1 / np.e**2))
        zeros = jnp.zeros((n_rays,), dtype=dt)
        return RayBundle(
            p=jnp.zeros((n_rays, 3), dtype=dt),
            d=d,
            opl=zeros,
            opl_c=zeros,
            alive=jnp.ones((n_rays,), dtype=bool),
            intensity=intensity,
            incidence=zeros,
            wavelength=jnp.asarray(WAVELENGTH, dtype=dt),
        )

    source = make_source()
    jax.block_until_ready(source)
    return source, elements


_COMPILE_SECONDS = {}  # per-path compile+first-run budget, reported in the JSON line


def warmup_mosaic(verbose=True):
    """Absorb the one-time per-process Pallas/Mosaic toolchain warmup on a
    trivial add-one kernel so per-path compile numbers are honest.

    Measured on the axon tunnel (2026-08-20): the FIRST Pallas kernel
    execution in a process pays ~500-700 s of backend warmup regardless of
    kernel content (a tiny add-one kernel: 720 s; the flagship whole-chain
    kernel immediately after: 1.5 s; a re-baked variant: 0.9 s). Round 2's
    'pallas_src compile: 513 s' was this warmup misattributed to whichever
    kernel happened to run first."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def add_one(x, o):
        o[:] = x[:] + 1.0

    fspec = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    t0 = time.perf_counter()
    f = pl.pallas_call(add_one, grid=(1,), in_specs=[fspec], out_specs=fspec,
                       out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                       interpret=jax.default_backend() == "cpu")
    v = float(jax.jit(f)(jnp.zeros((8, 128), jnp.float32)).sum())
    assert v == 8 * 128
    dt = time.perf_counter() - t0
    from attosecondraytracing_tpu.ops import warmup as _warmup

    _warmup.mark_warm()  # engine auto-selection may now assume warm kernels
    _COMPILE_SECONDS["mosaic_warmup"] = round(dt, 1)
    if verbose:
        print(f"# mosaic warmup (tiny kernel): {dt:.1f}s", file=sys.stderr)


def _slope_time(step_fn, arg, k_lo=1, k_hi=5, rounds=6, verbose=True, label=""):
    """Per-trace seconds via slope timing: (min t(k_hi) - min t(k_lo)) /
    (k_hi - k_lo).

    The per-dispatch RPC/launch/fetch overhead (~25-30 ms through the
    dev-environment tunnel — an artifact of the tunnel, not the chip) is
    amortized away by the subtraction; taking the min of each rep count
    SEPARATELY before subtracting rejects interference on the shared device
    without the fake-fast bias of min-of-differences (an interference spike
    inside t_lo would otherwise *shrink* the difference and overstate
    throughput).

    Sync note: on the tunneled TPU platform `jax.block_until_ready` returns
    before execution finishes, so each sample syncs by fetching the scalar
    result (float() forces a literal transfer, which cannot complete before
    the computation has)."""

    def timed(reps: int) -> float:
        t0 = time.perf_counter()
        v = float(step_fn(arg, reps))
        assert np.isfinite(v)
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    timed(k_lo)
    timed(k_hi)
    compile_s = time.perf_counter() - t0
    _COMPILE_SECONDS[label or "unnamed"] = round(compile_s, 1)
    if verbose:
        print(f"# {label} compile+first runs: {compile_s:.1f}s", file=sys.stderr)
    lo = min(timed(k_lo) for _ in range(rounds))
    hi = min(timed(k_hi) for _ in range(rounds))
    return (hi - lo) / (k_hi - k_lo)


def main(n_rays: int = 10_000_000, iters: int = 6, verbose: bool = True):
    from functools import partial

    from attosecondraytracing_tpu.ops import pallas_trace as pt
    from attosecondraytracing_tpu.ops.trace import trace

    t_start = time.perf_counter()
    source, elements = build_device(n_rays)
    if verbose:
        print(f"# build (on device): {time.perf_counter() - t_start:.1f}s", file=sys.stderr)
    # pay the one-time per-process Mosaic warmup on a trivial kernel so the
    # per-path compile budgets below are attributable (see warmup_mosaic)
    warmup_mosaic(verbose=verbose)

    # --- XLA path: whole chain in one jit, elements baked ------------------
    @partial(jax.jit, static_argnames=("reps",))
    def step_xla(source, reps: int):
        # reps traces are UNROLLED inside one dispatch (a lax.fori_loop would
        # serialize scheduling); the per-iteration source perturbation
        # defeats CSE across iterations. The consume touches every physical
        # output so none of the trace gets dead-code-eliminated.
        acc = jnp.asarray(0.0, dtype=source.p.dtype)
        for i in range(reps):
            src = source._replace(p=source.p + (i + 1) * 1e-30)
            out = trace(src, elements, keep_history=False)
            w = out.alive.astype(out.p.dtype) * out.intensity
            acc = (acc + out.opl.sum() + out.incidence.sum() + out.d.sum()
                   + out.p.sum() + w.sum())
        return acc

    # TPU compiler tuning: the default fusion-window instruction budget
    # splits this (long, purely elementwise) chain into ~30 fusions that
    # bounce ~10 GB of ray state through HBM; raising it keeps more of the
    # chain in registers/VMEM (measured 10.4 -> 6.9 ms/trace on v5e).
    opts = {"xla_jf_fusion_max_instruction_count_for_window_config": "4000"}
    compiled_xla = {}

    def step_xla_compiled(src, reps):
        if reps not in compiled_xla:
            lowered = jax.jit(lambda s: step_xla(s, reps)).lower(src)
            try:
                compiled_xla[reps] = lowered.compile(compiler_options=opts)
            except Exception:
                # non-TPU backends reject TPU compilation-environment options
                compiled_xla[reps] = lowered.compile()
        return compiled_xla[reps](src)

    # --- Pallas path: fused whole-chain kernel, fresh-source variant -------
    baked, maps, final, premasks = pt._static_chain(elements)
    tile = pt.BLOCK_ROWS * pt.LANES
    n_pad = ((n_rays + tile - 1) // tile) * tile

    def prep(x, fill=0.0):
        x = jnp.asarray(x)
        x = jnp.pad(x, (0, n_pad - n_rays), constant_values=fill)
        return x.reshape(n_pad // pt.LANES, pt.LANES)

    comps = tuple(jax.block_until_ready((
        prep(source.p[..., 0]), prep(source.p[..., 1]), prep(source.p[..., 2]),
        prep(source.d[..., 0]), prep(source.d[..., 1]), prep(source.d[..., 2], 1.0),
    )))

    @partial(jax.jit, static_argnames=("reps",))
    def step_pallas(comps, reps: int):
        acc = jnp.asarray(0.0, jnp.float32)
        for i in range(reps):
            c = (comps[0] + (i + 1) * 1e-30,) + comps[1:]
            outs = pt._pallas_trace_padded(
                c, baked, maps, final, premasks, pt.BLOCK_ROWS,
                jax.default_backend() == "cpu", fresh=True, n_rays=n_rays)
            for o in outs:
                acc = acc + o.astype(jnp.float32).sum()
        return acc

    # --- Pallas fused-source path: zero per-ray HBM reads -------------------
    spec = pt.make_source_spec("cone", np.zeros(3), np.array([1.0, 0, 0]), DIVERGENCE)

    @partial(jax.jit, static_argnames=("reps",))
    def step_src(phase, reps: int):
        acc = jnp.asarray(0.0, jnp.float32)
        for i in range(reps):
            # per-iteration spiral phase defeats CSE across the unrolled reps
            out = pt.pallas_trace_source(spec, elements, n_rays,
                                         wavelength=WAVELENGTH,
                                         phase=phase + i * 1e-7)
            for leaf in (out.p, out.d, out.opl, out.opl_c, out.incidence):
                acc = acc + leaf.astype(jnp.float32).sum()
            acc = acc + out.alive.sum().astype(jnp.float32)
        return acc

    # --- fused trace -> 20-distance detector-statistics scan ----------------
    # the production detector-optimization primitive: one kernel pass
    # evaluates spot/duration statistics at 20 scan distances for the whole
    # bundle (ART evaluates these serially per position per ray)
    from attosecondraytracing_tpu.models.detector import Detector

    probe = pt.source_bundle(spec, 4096, wavelength=WAVELENGTH)
    from attosecondraytracing_tpu.ops.trace import trace as _trace

    det = Detector(np.zeros(3))
    det.autoplace(_trace(probe, elements, keep_history=False), 500.0)
    distances = tuple(np.linspace(-10.0, 10.0, 20))
    opl_ref, _offsets, inv_dn_chief = pt.chief_ray_refs(
        spec, elements, det.centre, det.normal, distances)
    det_b = pt.bake_detector(elements, det.centre, det.normal,
                             det._plane_rotation(),
                             opl_ref=opl_ref, inv_dn_chief=inv_dn_chief)
    baked_f, maps_f, final_f, premasks_f = pt._source_maps(spec, elements)
    mtile = pt.MOMENT_BLOCK_ROWS * pt.LANES
    n_pad_s = ((n_rays + mtile - 1) // mtile) * mtile

    @partial(jax.jit, static_argnames=("reps",))
    def step_scan(phase, reps: int):
        # moment epilogue: one pass yields the stats of ANY number of scan
        # distances (the 20 in the metric name are evaluated host-side)
        acc = jnp.asarray(0.0, jnp.float32)
        for i in range(reps):
            out = pt._pallas_source_moments_padded(
                phase + i * 1e-7, jnp.float32(0.0), jnp.float32(0.0), spec,
                baked_f, maps_f, final_f, premasks_f, det_b,
                pt.MOMENT_BLOCK_ROWS, jax.default_backend() == "cpu",
                n_rays, n_rays, n_pad_s // pt.LANES, None)
            acc = acc + out.sum()
        return acc

    # --- runtime-scalar scan kernel: poses as SMEM scalars ------------------
    # (the parameter-scan engine, ops/pallas_scan.py: one compile serves a
    # whole structurally-uniform scan; A/B'd against the baked moment kernel)
    from attosecondraytracing_tpu.ops import pallas_scan as psn

    scan_spec = psn.make_scan_spec("cone", elements, n_rays)
    svec = jnp.asarray(psn.scan_chain_scalars(
        elements, np.asarray(spec.rot), np.zeros(3), det.centre, det.normal,
        det._plane_rotation()))
    aux_base = np.array(
        [opl_ref, inv_dn_chief, 0.0, np.tan(DIVERGENCE), 0.0, 0.0, 0.0, 0.0],
        np.float32)
    aux_j = jnp.asarray(aux_base)

    @partial(jax.jit, static_argnames=("reps",))
    def step_scan_rt(phase, reps: int):
        acc = jnp.asarray(0.0, jnp.float32)
        for i in range(reps):
            aux_i = aux_j.at[psn.AUX_PHASE].set(phase + i * 1e-7)
            out = psn._pallas_scan_moments_padded(
                svec, aux_i, scan_spec, jax.default_backend() == "cpu",
                n_rays, n_pad_s // pt.LANES)
            acc = acc + out.sum()
        return acc

    results = {}
    results["scan_rt"] = _slope_time(step_scan_rt, jnp.float32(0.0),
                                     rounds=iters, verbose=verbose,
                                     label="scan_rt")
    if verbose:
        print(f"# scan_rt (runtime-scalar poses): "
              f"{results['scan_rt']*1e3:.3f} ms/pass", file=sys.stderr)
    results["scan20"] = _slope_time(step_scan, jnp.float32(0.0), rounds=iters,
                                    verbose=verbose, label="scan20")
    if verbose:
        print(f"# scan20: {results['scan20']*1e3:.3f} ms/pass "
              f"({20 * n_rays / results['scan20'] / 1e9:.1f} Gray-distance-evals/s)",
              file=sys.stderr)
    results["pallas_src"] = _slope_time(step_src, jnp.float32(0.0), rounds=iters,
                                        verbose=verbose, label="pallas_src")
    if verbose:
        print(f"# pallas_src: {results['pallas_src']*1e3:.3f} ms/trace", file=sys.stderr)
    results["pallas"] = _slope_time(step_pallas, comps, rounds=iters,
                                    verbose=verbose, label="pallas")
    if verbose:
        print(f"# pallas: {results['pallas']*1e3:.3f} ms/trace", file=sys.stderr)
    results["xla"] = _slope_time(step_xla_compiled, source, rounds=iters,
                                 verbose=verbose, label="xla")
    if verbose:
        print(f"# xla:    {results['xla']*1e3:.3f} ms/trace", file=sys.stderr)

    trace_paths = {k: v for k, v in results.items()
                   if k not in ("scan20", "scan_rt")}
    path, dt = min(trace_paths.items(), key=lambda kv: kv[1])
    rays_per_s = n_rays / dt
    print(
        json.dumps(
            {
                "metric": "rays_per_second",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / 1e9,
                "path": path,
                "xla_rays_per_second": n_rays / results["xla"],
                "pallas_rays_per_second": n_rays / results["pallas"],
                "pallas_src_rays_per_second": n_rays / results["pallas_src"],
                # fused trace->stats kernel: whole-bundle spot/duration
                # statistics at 20 detector distances in one pass
                "scan20_ms": results["scan20"] * 1e3,
                "scan20_ray_distance_evals_per_s": 20 * n_rays / results["scan20"],
                # runtime-scalar-pose scan kernel (ops/pallas_scan): the
                # parameter-scan engine's per-chain kernel pass
                "scan_runtime_scalar_ms": results["scan_rt"] * 1e3,
                # compile budget [s]: mosaic_warmup is the one-time
                # per-process toolchain cost; per-path entries are the real
                # kernel compile+first-run times (regressions show up here)
                "compile_seconds": dict(_COMPILE_SECONDS),
            }
        )
    )
    return rays_per_s


if __name__ == "__main__":
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    main(n, it)
