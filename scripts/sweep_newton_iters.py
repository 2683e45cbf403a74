"""Sweep _NEWTON_ITERS_TOROID_FAST: f32-vs-f64 intersection error on a
grazing-incidence toroid + fused-kernel throughput at each setting."""

import sys
import time
from functools import partial

import jax

# the f64 reference trace must actually run in float64 (and thereby take the
# exact-quartic toroid path, surfaces.py dtype gate) — without this the sweep
# compares fast-Newton against itself and reports misleading ~zero error
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from attosecondraytracing_tpu.ops import surfaces as srf
from attosecondraytracing_tpu.ops import pallas_trace as pt
from attosecondraytracing_tpu.models import mirrors as mmirror
from attosecondraytracing_tpu.models import supports as msupp
from attosecondraytracing_tpu.models.placement import OEPlacement


def accuracy(iters):
    # the iteration count is read from a module global at trace time, so any
    # cached executable baked the previous value — drop all jit caches
    jax.clear_caches()
    srf._NEWTON_ITERS_TOROID_FAST = iters
    focal, inc = 500.0, 80.0
    R, r = mmirror.ReturnOptimalToroidalRadii(focal, inc)
    tor = mmirror.MirrorToroidal(R, r, msupp.SupportRectangle(300, 50))
    props = {"Divergence": 15e-3, "SourceSize": 0, "Wavelength": 50e-6, "DeltaFT": 1, "NumberRays": 4000}
    chain = OEPlacement(props, [tor], [2 * focal], [inc])
    from attosecondraytracing_tpu.ops.trace import trace as trace_fn

    out64 = chain.get_output_rays()[-1]
    src32 = jax.tree.map(
        lambda x: np.asarray(x).astype(np.float32)
        if np.issubdtype(np.asarray(x).dtype, np.floating)
        else np.asarray(x),
        chain.source_rays,
    )
    els32 = [e.to_device(dtype=jnp.float32) for e in chain.optical_elements]
    out32 = trace_fn(src32, els32, keep_history=False)
    a = np.asarray(out64.alive) & np.asarray(out32.alive)
    agree = np.mean(np.asarray(out64.alive) == np.asarray(out32.alive))
    dp = np.asarray(out32.p)[a] - np.asarray(out64.p)[a]
    dopl = np.asarray(out32.opl)[a] - np.asarray(out64.opl)[a]
    return agree, np.std(dp), np.percentile(np.abs(dp), 99), np.std(dopl)


def speed(iters, n_rays=10_000_000, reps_pair=(1, 5), rounds=5):
    # _pallas_trace_padded is a module-level jit whose static args are
    # identical across iters values; without clearing, every sweep point
    # would reuse the executable compiled for the FIRST value
    jax.clear_caches()
    srf._NEWTON_ITERS_TOROID_FAST = iters
    if jax.default_backend() != "tpu":
        raise SystemExit("speed() requires a TPU backend (the fused kernel is not compiled for CPU)")
    from bench import build_device

    source, elements = build_device(n_rays)
    baked, maps, final, premasks = pt._static_chain(elements)
    tile = pt.BLOCK_ROWS * pt.LANES
    n_pad = ((n_rays + tile - 1) // tile) * tile

    def prep(x, fill=0.0):
        x = jnp.asarray(x)
        x = jnp.pad(x, (0, n_pad - n_rays), constant_values=fill)
        return x.reshape(n_pad // pt.LANES, pt.LANES)

    comps = (
        prep(source.p[..., 0]), prep(source.p[..., 1]), prep(source.p[..., 2]),
        prep(source.d[..., 0]), prep(source.d[..., 1]), prep(source.d[..., 2], 1.0),
        prep(source.opl), prep(source.opl_c),
        prep(source.alive.astype(jnp.int8)), prep(source.incidence),
    )
    comps = jax.block_until_ready(comps)

    @partial(jax.jit, static_argnames=("reps",))
    def step(comps, reps):
        acc = jnp.asarray(0.0, jnp.float32)
        for i in range(reps):
            c = (comps[0] + (i + 1) * 1e-30,) + comps[1:]
            outs = pt._pallas_trace_padded(c, baked, maps, final, premasks, pt.BLOCK_ROWS, False)
            for o in outs:
                acc = acc + o.astype(jnp.float32).sum()
        return acc

    def timed(reps):
        t0 = time.perf_counter()
        v = float(step(comps, reps))
        assert np.isfinite(v)
        return time.perf_counter() - t0

    k_lo, k_hi = reps_pair
    timed(k_lo); timed(k_hi)
    dt = float("inf")
    for _ in range(rounds):
        dt = min(dt, (timed(k_hi) - timed(k_lo)) / (k_hi - k_lo))
    return n_rays / dt / 1e9


if __name__ == "__main__":
    for it in (3, 4, 5, 6, 8):
        agree, sd, p99, sopl = accuracy(it)
        print(f"iters={it}: hit-agree={agree:.4f} pos-sd={sd:.2e}mm p99={p99:.2e}mm opl-sd={sopl:.2e}mm", flush=True)
    for it in (4, 5, 6, 8):
        g = speed(it)
        print(f"iters={it}: {g:.3f} Grays/s", flush=True)
