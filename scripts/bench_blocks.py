"""Re-sweep the Pallas kernel's block_rows after arithmetic changes, inside
ONE process (one Mosaic warmup). Prints ms/trace per block size for the
fused-source kernel on the flagship chain.

Run: python scripts/bench_blocks.py [n_rays] [sizes...]
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


def measure(block_rows, n_rays, spec, elements, iters=6):
    @partial(jax.jit, static_argnames=("reps",))
    def step_src(phase, reps: int):
        acc = jnp.asarray(0.0, jnp.float32)
        for i in range(reps):
            out = pt.pallas_trace_source(spec, elements, n_rays,
                                         wavelength=bench.WAVELENGTH,
                                         block_rows=block_rows,
                                         phase=phase + i * 1e-7)
            for leaf in (out.p, out.d, out.opl, out.opl_c, out.incidence):
                acc = acc + leaf.astype(jnp.float32).sum()
            acc = acc + out.alive.sum().astype(jnp.float32)
        return acc

    dt = bench._slope_time(step_src, jnp.float32(0.0), rounds=iters,
                           verbose=True, label=f"block{block_rows}")
    print(f"# block_rows={block_rows}: {dt * 1e3:.3f} ms/trace "
          f"= {n_rays / dt / 1e9:.2f} Grays/s", file=sys.stderr)
    return dt


def main(n_rays=10_000_000, sizes=(32, 64, 128)):
    t0 = time.perf_counter()
    _, elements = bench.build_device(16)
    spec = pt.make_source_spec("cone", np.zeros(3), np.array([1.0, 0, 0]),
                               bench.DIVERGENCE)
    bench.warmup_mosaic()
    print(f"# setup+warmup: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    results = {}
    # sweep down-up-down to separate block effects from shared-chip drift
    order = list(sizes) + list(sizes)[::-1]
    for b in order:
        dt = measure(b, n_rays, spec, elements)
        results.setdefault(b, []).append(dt)
    for b in sizes:
        best = min(results[b]) * 1e3
        print(f"RESULT block_rows={b}: {best:.3f} ms "
              f"({n_rays / min(results[b]) / 1e9:.2f} Grays/s)")


if __name__ == "__main__":
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    sizes = tuple(int(s) for s in sys.argv[2:]) or (32, 64, 128)
    main(n, sizes)
