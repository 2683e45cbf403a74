"""Headline benchmark: rays/s through the 2-toroidal grazing-incidence chain.

BASELINE.md target: >= 1e9 rays/s/chip through a 2-element toroidal chain
with a 1e7-ray bundle (the reference traces ~1e3 rays in seconds-level pure
Python). Prints ONE JSON line:
  {"metric": "rays_per_second", "value": N, "unit": "rays/s", "vs_baseline": N/1e9}

Measurement integrity (round 5): every path is timed TWO independent ways —
slope timing (amortizes the ~25-30 ms/dispatch tunnel overhead) and direct
timing (min dispatch wall time minus an independently measured dispatch
overhead) — and a timing is only trusted when the two agree within 2x. Each
per-trace time is also checked against a physical roofline: the path's
minimum HBM traffic (bytes/ray, from the kernel's stream layout) divided by
the *measured* achievable copy bandwidth of this chip. A path that "beats"
the roofline, or a path that beats a strictly-less-work path by >1.4x, is
marked ``suspect`` and excluded from the headline. Round 4's recorded
headline (85e9 rays/s, BENCH_r04.json) was a slope-timing artifact — an
interference spike inflating the low-rep sample — that implied ~5 TB/s of
HBM bandwidth on a ~0.8 TB/s chip; these guards reject exactly that class
of result (tests/test_bench_guards.py replays the r4 numbers through them).
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

# Minimum HBM traffic per ray for each measured path, from the kernel stream
# layouts (ops/pallas_trace.py module docstring): the streamed/fresh trace
# reads 6 f32 position/direction components (24 B) and writes the full
# output bundle (8 f32 + bool + f32 = 37 B); the fused-source trace writes
# the same 37 B but reads nothing per-ray; the XLA path materializes at
# least the output bundle; moment-epilogue paths (scan20/scan_rt/xla_src)
# write only O(programs) partial-sum rows — no meaningful per-ray floor, so
# they rely on the slope-vs-direct cross-check alone.
MIN_BYTES_PER_RAY = {
    "pallas": 61.0,
    "pallas_src": 37.0,
    "xla": 37.0,
    "scan20": 0.0,
    "scan_rt": 0.0,
    "xla_src": 0.0,
}

# Paths where A does strictly MORE memory work than B: A measuring faster
# than B by >1/ORDERING_TOL is a measurement error, not a speedup.
ORDERING_PAIRS = [("pallas", "pallas_src")]
ORDERING_TOL = 0.7      # A < 0.7 * B  ->  flag A
RECONCILE_TOL = 2.0     # slope vs direct must agree within 2x
ROOFLINE_MARGIN = 0.7   # per-trace time may undercut the copy-probe floor
                        # by at most 1/0.7 (probe is achievable, not peak)


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


def build_defect_chain():
    """CONFIG_deformed-class chain (examples/CONFIG_deformed.py): on-axis
    parabola carrying a synthesized Fourier-PSD grid defect — the workload
    class that must take the XLA fused-source engine (ops/xla_source.py)
    because grid interpolation needs gathers Mosaic does not lower. Built
    with a small host bundle (the benched engine synthesizes its rays
    in-jit from the chain's fused-source spec)."""
    from attosecondraytracing_tpu.models import defects as mdef
    from attosecondraytracing_tpu.models import mirrors as mmirror
    from attosecondraytracing_tpu.models import supports as msupp
    from attosecondraytracing_tpu.models.placement import OEPlacement

    support = msupp.SupportRectangle(40, 40)
    mirror = mmirror.MirrorParabolic(25.4, 0, support)
    # smallest=0.05 -> ~1600x1600 grid (~10 MB/map): far beyond Mosaic's
    # single-tile gather limit (so this genuinely exercises the XLA grid
    # path) without CONFIG_deformed's 8000^2 / ~768 MB maps, which belong in
    # a production run, not a repeated benchmark dispatch
    defect = mdef.Fourrier(support, RMS=1e-1, smallest=0.05, seed=12345)
    deformed = mmirror.DeformedMirror(mirror, [defect])
    props = {
        "Divergence": 0,
        "SourceSize": 100,
        "Wavelength": 800e-6,
        "DeltaFT": 0,
        "NumberRays": 4096,
    }
    return OEPlacement(props, [deformed], [15], [0], Description="bench defect chain")


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


# ---------------------------------------------------------------------------
# measurement-integrity machinery (round 5; pure parts unit-tested in
# tests/test_bench_guards.py against the round-4 artifact numbers)
# ---------------------------------------------------------------------------


def measure_overhead(rounds: int = 12) -> float:
    """Per-dispatch RPC/launch/result-fetch overhead [s]: min wall time of a
    trivial jitted scalar computation, fetch-synced. Through the dev tunnel
    this is ~25-30 ms; on a directly attached chip it is sub-ms."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(1.0)
    float(f(x))  # compile
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def measure_copy_bandwidth(overhead_s: float, mbytes: int = 512,
                           k_hi: int = 9, rounds: int = 5) -> float:
    """Achievable HBM copy bandwidth [bytes/s], measured — not a spec-sheet
    number. A fori_loop repeatedly adds a scalar to an ``mbytes``-sized f32
    array; each iteration must read and write the full carry (the loop-carried
    dependence defeats elementwise fusion across iterations), so one rep moves
    2*mbytes. Direct timing (min dispatch wall time minus the measured
    dispatch overhead) — at 9 reps of a 1 GB round trip the signal (~10 ms on
    a ~0.8 TB/s chip) is well above the tunnel's ms-level timing noise, where
    a small-buffer slope probe drowns in it."""
    from functools import partial

    n = mbytes * (1 << 20) // 4
    x = jnp.arange(n, dtype=jnp.float32) * 1e-9

    @partial(jax.jit, static_argnames=("reps",))
    def step(x, reps: int):
        y = jax.lax.fori_loop(0, reps, lambda i, y: y + 1.0, x)
        return y[:: 1 << 16].sum()

    def timed(reps: int) -> float:
        t0 = time.perf_counter()
        v = float(step(x, reps))
        assert np.isfinite(v)
        return time.perf_counter() - t0

    timed(k_hi)  # compile
    hi = min(timed(k_hi) for _ in range(rounds))
    bytes_per_rep = 2 * 4 * n  # read + write the carry
    return bytes_per_rep * k_hi / max(hi - overhead_s, 1e-6)


def reconcile(slope_s: float, direct_s: float, tol: float = RECONCILE_TOL,
              noise_s: float = 0.0):
    """Cross-check the two independent timings. Returns
    ``(canonical_s, consistent)``: the slope value when the two agree within
    ``tol``x — or within ``noise_s`` absolute (the direct sample's own noise
    floor, ~overhead_jitter/k_hi: for passes much faster than one dispatch
    overhead the ratio test is meaningless) — else the LARGER of the two
    (conservative: an interference spike can only make slope timing look
    fake-fast, never fake-slow; r4's 0.118 ms artifact vs the 2.03 ms direct
    rerun is the motivating case)."""
    if abs(slope_s - direct_s) <= noise_s:
        # consistent within the dispatch noise; a sub-noise (or interference-
        # negative) slope still reports the better-bounded of the two rather
        # than a meaningless 0.0
        return max(slope_s, direct_s, 0.0), True
    if slope_s <= 0 or direct_s <= 0:
        return max(slope_s, direct_s, 0.0), False
    ratio = max(slope_s, direct_s) / min(slope_s, direct_s)
    if ratio <= tol:
        return slope_s, True
    return max(slope_s, direct_s), False


def roofline_floor_s(n_rays: int, bytes_per_ray: float, bw_bytes_per_s: float) -> float:
    """Minimum physically possible per-trace seconds given the path's HBM
    traffic and the chip's measured copy bandwidth."""
    return n_rays * bytes_per_ray / bw_bytes_per_s


def roofline_ok(per_trace_s: float, n_rays: int, bytes_per_ray: float,
                bw_bytes_per_s: float, margin: float = ROOFLINE_MARGIN) -> bool:
    """A per-trace time that implies more than 1/margin of the measured copy
    bandwidth is impossible (the copy probe is achievable bandwidth; no
    kernel with this much traffic can beat it by much). r4's artifact
    implied ~5 TB/s on a ~0.5 TB/s-measured chip — rejected here."""
    return per_trace_s >= margin * roofline_floor_s(n_rays, bytes_per_ray, bw_bytes_per_s)


def ordering_flags(times: dict, pairs=None, tol: float = ORDERING_TOL):
    """Paths measuring faster than a strictly-less-work path: for (A, B)
    pairs where A's HBM traffic is a strict superset of B's, A < tol*B means
    the A measurement is wrong (r4: streamed 0.118 ms vs fused-source
    1.038 ms). Returns the list of flagged path names."""
    flagged = []
    for a, b in (ORDERING_PAIRS if pairs is None else pairs):
        if a in times and b in times and times[a] < tol * times[b]:
            flagged.append(a)
    return flagged


def _slope_time(step_fn, arg, k_lo=1, k_hi=5, rounds=6, verbose=True, label=""):
    """Slope-only timing (legacy; kept for the A/B and sweep scripts under
    scripts/). Per-trace seconds = (min t(k_hi) - min t(k_lo)) / (k_hi -
    k_lo), mins per rep count taken SEPARATELY before subtracting.
    bench.main itself uses :func:`_measure_path`, which adds the
    direct-timing cross-check and the plausibility guards — any number that
    gets *recorded* should come from that."""

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


def _measure_path(step_fn, arg, *, label: str, n_rays: int, overhead_s: float,
                  bw_bytes_per_s: float, k_lo: int = 1, k_hi: int = 8,
                  rounds: int = 6, verbose: bool = True) -> dict:
    """Time one path both ways and apply the plausibility guards.

    Slope timing: per-trace seconds = (min t(k_hi) - min t(k_lo)) /
    (k_hi - k_lo); mins taken per rep count SEPARATELY before subtracting
    (min-of-differences would bias fake-fast under interference).
    Direct timing: (min t(k_hi) - measured dispatch overhead) / k_hi — one
    dispatch, result-fetch synced, no subtraction of two noisy samples.

    Sync note: on the tunneled TPU platform ``jax.block_until_ready`` returns
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
    _COMPILE_SECONDS[label] = round(compile_s, 1)
    if verbose:
        print(f"# {label} compile+first runs: {compile_s:.1f}s", file=sys.stderr)
    lo = min(timed(k_lo) for _ in range(rounds))
    hi = min(timed(k_hi) for _ in range(rounds))
    slope = (hi - lo) / (k_hi - k_lo)
    direct = max(hi - overhead_s, 0.0) / k_hi
    canonical, consistent = reconcile(slope, direct,
                                      noise_s=0.25 * overhead_s / k_hi)
    suspect, reasons = [], []
    if not consistent:
        reasons.append(
            f"slope {slope*1e3:.3f} ms vs direct {direct*1e3:.3f} ms disagree >"
            f"{RECONCILE_TOL}x")
    bytes_per_ray = MIN_BYTES_PER_RAY.get(label, 0.0)
    if bytes_per_ray and not roofline_ok(canonical, n_rays, bytes_per_ray,
                                         bw_bytes_per_s):
        floor = roofline_floor_s(n_rays, bytes_per_ray, bw_bytes_per_s)
        reasons.append(
            f"{canonical*1e3:.3f} ms beats the {floor*1e3:.3f} ms HBM floor "
            f"({bytes_per_ray:.0f} B/ray at measured "
            f"{bw_bytes_per_s/1e9:.0f} GB/s)")
    rec = {
        "slope_ms": slope * 1e3,
        "direct_ms": direct * 1e3,
        "ms": canonical * 1e3,
        "suspect": bool(reasons),
        "why": reasons,
        # true when the per-pass time sits below the dispatch-noise floor
        # (small-n smoke runs): the value is an upper-bound-ish estimate,
        # not a measurement
        "below_noise": max(slope, direct) < 0.25 * overhead_s / k_hi,
    }
    if verbose:
        tag = "  SUSPECT: " + "; ".join(reasons) if reasons else ""
        print(f"# {label}: {canonical*1e3:.3f} ms/pass "
              f"(slope {slope*1e3:.3f}, direct {direct*1e3:.3f}){tag}",
              file=sys.stderr)
    return rec


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

    # measurement-integrity probes: dispatch overhead (for direct timing) and
    # achievable copy bandwidth (for the per-path roofline floors)
    overhead_s = measure_overhead()
    bw = measure_copy_bandwidth(overhead_s)
    if verbose:
        print(f"# dispatch overhead: {overhead_s*1e3:.1f} ms; measured copy "
              f"bandwidth: {bw/1e9:.0f} GB/s", file=sys.stderr)

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

    # --- XLA fused-source defect engine: grid-defect chain moments ----------
    # (ops/xla_source.py — the engine grid-defect chains auto-select because
    # Mosaic lowers no usable gather; VERDICT r4 weak #4: without a bench
    # entry a regression in the defect path would be invisible)
    from attosecondraytracing_tpu.ops import xla_source as xs

    defect_chain = build_defect_chain()
    d_spec = defect_chain.source_spec.baked()
    d_els = defect_chain.device_elements()
    d_det = Detector(defect_chain.optical_elements[-1].position)
    d_det.autoplace(defect_chain.trace_final(), 25.4)
    d_opl_ref, _off, d_inv_dn = pt.chief_ray_refs(
        d_spec, d_els, d_det.centre, d_det.normal, (0.0,))
    d_bdet = pt.bake_detector(d_els, d_det.centre, d_det.normal,
                              d_det._plane_rotation(),
                              opl_ref=d_opl_ref, inv_dn_chief=d_inv_dn)
    # one transfer for the geometry + defect grids (they are jit ARGUMENTS
    # of the xla-source engine, not baked constants — re-passing host NumPy
    # would re-upload the ~10 MB maps through the tunnel every dispatch);
    # python-scalar leaves stay as-is to keep their weak dtypes
    d_in = jax.tree.map(
        lambda x: jax.device_put(x) if isinstance(x, np.ndarray) else x,
        xs._source_inputs(d_spec, d_els))

    @partial(jax.jit, static_argnames=("reps",))
    def step_xla_src(phase, reps: int):
        acc = jnp.asarray(0.0, jnp.float32)
        for i in range(reps):
            row = xs._xla_source_run(
                d_in[0], d_in[1], d_in[2], d_in[3], d_bdet, d_spec.kind,
                jnp.float32(d_spec.radius), phase + i * 1e-7,
                jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
                jnp.float32(d_spec.pos_radius), n_rays, n_rays,
                d_spec.n_each, d_spec.n_sources, False, True)
            acc = acc + row.sum()
        return acc

    measure = partial(_measure_path, n_rays=n_rays, overhead_s=overhead_s,
                      bw_bytes_per_s=bw, rounds=iters, verbose=verbose)
    paths = {}
    paths["scan_rt"] = measure(step_scan_rt, jnp.float32(0.0), label="scan_rt")
    paths["scan20"] = measure(step_scan, jnp.float32(0.0), label="scan20")
    # k_hi=3: the defect pass is ~0.5 s — 20x the dispatch overhead, so the
    # two timings are robust at small rep counts, and the unrolled
    # gather-heavy executable compiles ~2.5x faster (was 143 s at 8 reps)
    paths["xla_src"] = measure(step_xla_src, jnp.float32(0.0), label="xla_src",
                               k_hi=3)
    paths["pallas_src"] = measure(step_src, jnp.float32(0.0), label="pallas_src")
    paths["pallas"] = measure(step_pallas, comps, label="pallas")
    # k_hi=5 for XLA: the unrolled-reps executable compiles ~linearly in
    # reps and this path's per-trace time (~7 ms) is far above the direct
    # sample's noise floor anyway
    paths["xla"] = measure(step_xla_compiled, source, label="xla", k_hi=5)

    # cross-path ordering guard: a path doing strictly more HBM work cannot
    # legitimately beat its subset path (r4: pallas 0.118 ms vs src 1.038 ms)
    times = {k: v["ms"] * 1e-3 for k, v in paths.items()}
    for name in ordering_flags(times):
        paths[name]["suspect"] = True
        paths[name]["why"].append(
            "beats a strictly-less-work path by >" f"{1/ORDERING_TOL:.1f}x")

    trace_paths = {k: v for k, v in paths.items()
                   if k in ("pallas", "pallas_src", "xla")}
    trusted = {k: v for k, v in trace_paths.items() if not v["suspect"]}
    chosen = trusted or trace_paths  # all-suspect: still report, marked
    path = min(chosen, key=lambda k: chosen[k]["ms"])
    dt = chosen[path]["ms"] * 1e-3
    rays_per_s = n_rays / dt
    suspect_paths = sorted(k for k, v in paths.items() if v["suspect"])
    print(
        json.dumps(
            {
                "metric": "rays_per_second",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / 1e9,
                "path": path,
                "suspect": not trusted,
                "suspect_paths": suspect_paths,
                "overhead_ms": overhead_s * 1e3,
                "copy_bandwidth_gb_s": bw / 1e9,
                "xla_rays_per_second": n_rays / (paths["xla"]["ms"] * 1e-3),
                "pallas_rays_per_second": n_rays / (paths["pallas"]["ms"] * 1e-3),
                "pallas_src_rays_per_second": n_rays / (paths["pallas_src"]["ms"] * 1e-3),
                # fused trace->stats kernel: whole-bundle spot/duration
                # statistics at 20 detector distances in one pass
                "scan20_ms": paths["scan20"]["ms"],
                "scan20_ray_distance_evals_per_s": 20 * n_rays / (paths["scan20"]["ms"] * 1e-3),
                # runtime-scalar-pose scan kernel (ops/pallas_scan): the
                # parameter-scan engine's per-chain kernel pass
                "scan_runtime_scalar_ms": paths["scan_rt"]["ms"],
                # XLA fused-source defect engine (grid-defect chain moments)
                "xla_src_defect_ms": paths["xla_src"]["ms"],
                "defect_rays_per_second": n_rays / (paths["xla_src"]["ms"] * 1e-3),
                # both timings + guard verdicts per path (slope vs direct;
                # roofline vs measured copy bandwidth; ordering)
                "paths": {k: {kk: (round(vv, 4) if isinstance(vv, float) else vv)
                              for kk, vv in v.items()} for k, v in paths.items()},
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
