"""A/B mask folding (trace.fold_premasks) in ONE process (one Mosaic warmup):
fused-source kernel on the flagship chain with folding on vs off,
interleaved on/off/on to control shared-chip drift.

Run: python scripts/bench_ab_fold.py [n_rays]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from attosecondraytracing_tpu.ops import pallas_trace as pt
from attosecondraytracing_tpu.ops import trace as tr


def _no_fold(elements, maps):
    return list(elements), [
        (np.asarray(M, np.float64), np.asarray(b, np.float64)) for M, b in maps
    ], [()] * len(elements)


def measure(tag, n_rays, spec, elements, iters=6):
    @partial(jax.jit, static_argnames=("reps",))
    def step_src(phase, reps: int):
        acc = jnp.asarray(0.0, jnp.float32)
        for i in range(reps):
            out = pt.pallas_trace_source(spec, elements, n_rays,
                                         wavelength=bench.WAVELENGTH,
                                         phase=phase + i * 1e-7)
            for leaf in (out.p, out.d, out.opl, out.opl_c, out.incidence):
                acc = acc + leaf.astype(jnp.float32).sum()
            acc = acc + out.alive.sum().astype(jnp.float32)
        return acc

    dt = bench._slope_time(step_src, jnp.float32(0.0), rounds=iters,
                           verbose=True, label=tag)
    print(f"# {tag}: {dt * 1e3:.3f} ms/trace = {n_rays / dt / 1e9:.2f} Grays/s",
          file=sys.stderr)
    return dt


def main(n_rays=10_000_000):
    t0 = time.perf_counter()
    _, elements = bench.build_device(16)
    spec = pt.make_source_spec("cone", np.zeros(3), np.array([1.0, 0, 0]),
                               bench.DIVERGENCE)
    bench.warmup_mosaic()
    print(f"# setup+warmup: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    fold = tr.fold_premasks
    results = {}
    for tag, fn in (("fold_1", fold), ("nofold", _no_fold), ("fold_2", fold)):
        pt.fold_premasks = fn  # pallas_trace imported the name directly
        jax.clear_caches()
        results[tag] = measure(tag, n_rays, spec, elements)
    pt.fold_premasks = fold
    on_ms = min(results["fold_1"], results["fold_2"]) * 1e3
    off_ms = results["nofold"] * 1e3
    print(f"RESULT fold={on_ms:.3f} ms nofold={off_ms:.3f} ms "
          f"speedup={off_ms / on_ms:.3f}x")


if __name__ == "__main__":
    main(int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000)
