"""Sweep the TPU fusion-window instruction budget for the XLA fallback path.

The XLA whole-chain trace (the engine for grid-defect chains and non-fused
sources) is HBM-bound: the default fusion window splits the long elementwise
chain into many fusions that bounce ray state through HBM. Round 1 found
4000 ≈ 1.5x better than default; this sweeps further values in one process
(no Mosaic warmup needed — pure XLA).

Run: python scripts/sweep_fusion_window.py [n_rays]
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
from attosecondraytracing_tpu.ops.trace import trace


def main(n_rays=10_000_000,
         windows=(None, 1000, 2000, 4000, 8000, 16000, 30000)):
    source, elements = bench.build_device(n_rays)

    @partial(jax.jit, static_argnames=("reps",))
    def step(source, reps: int):
        acc = jnp.asarray(0.0, dtype=source.p.dtype)
        for i in range(reps):
            src = source._replace(p=source.p + (i + 1) * 1e-30)
            out = trace(src, elements, keep_history=False)
            w = out.alive.astype(out.p.dtype) * out.intensity
            acc = (acc + out.opl.sum() + out.incidence.sum() + out.d.sum()
                   + out.p.sum() + w.sum())
        return acc

    results = {}
    for win in windows:
        compiled = {}
        opts = (
            {}
            if win is None
            else {"xla_jf_fusion_max_instruction_count_for_window_config": str(win)}
        )

        def stepc(src, reps, _opts=opts, _cache=compiled):
            if reps not in _cache:
                lowered = jax.jit(lambda s: step(s, reps)).lower(src)
                try:
                    _cache[reps] = lowered.compile(compiler_options=_opts)
                except Exception:
                    _cache[reps] = lowered.compile()
            return _cache[reps](src)

        dt = bench._slope_time(stepc, source, rounds=6, verbose=True,
                               label=f"win{win}")
        results[win] = dt
        print(f"# window={win}: {dt * 1e3:.3f} ms/trace "
              f"= {n_rays / dt / 1e9:.2f} Grays/s", file=sys.stderr)
    best = min(results, key=results.get)
    for win in windows:
        print(f"RESULT window={win}: {results[win] * 1e3:.3f} ms"
              + ("  <-- best" if win == best else ""))


if __name__ == "__main__":
    main(int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000)
