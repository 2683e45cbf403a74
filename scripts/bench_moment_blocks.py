"""block_rows sweep for the trace->moments kernel (one process, one warmup).

The moment kernel has no per-ray outputs (register/VMEM pressure differs
from the trace kernel), so its optimal block size may differ from the
trace kernel's 64. Run: python scripts/bench_moment_blocks.py [n_rays]
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
from attosecondraytracing_tpu.models.detector import Detector
from attosecondraytracing_tpu.ops import pallas_trace as pt
from attosecondraytracing_tpu.ops.trace import trace


def main(n_rays=10_000_000, sizes=(32, 64, 128, 256)):
    t0 = time.perf_counter()
    _, elements = bench.build_device(16)
    spec = pt.make_source_spec("cone", np.zeros(3), np.array([1.0, 0, 0]),
                               bench.DIVERGENCE)
    probe = pt.source_bundle(spec, 4096, wavelength=bench.WAVELENGTH)
    det = Detector(np.zeros(3))
    det.autoplace(trace(probe, elements, keep_history=False), 500.0)
    opl_ref, _o, inv_dn_chief = pt.chief_ray_refs(
        spec, elements, det.centre, det.normal, (0.0,))
    det_b = pt.bake_detector(elements, det.centre, det.normal,
                             det._plane_rotation(), opl_ref=opl_ref,
                             inv_dn_chief=inv_dn_chief)
    baked, maps, final, premasks = pt._source_maps(spec, elements)
    bench.warmup_mosaic()
    print(f"# setup+warmup: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    results = {}

    def measure(block_rows):
        tile = block_rows * pt.LANES
        n_pad = ((n_rays + tile - 1) // tile) * tile

        @partial(jax.jit, static_argnames=("reps",))
        def step(phase, reps: int):
            acc = jnp.asarray(0.0, jnp.float32)
            for i in range(reps):
                out = pt._pallas_source_moments_padded(
                    phase + i * 1e-7, jnp.float32(0.0), jnp.float32(0.0),
                    spec, baked, maps, final, premasks, det_b, block_rows,
                    False, n_rays, n_rays, n_pad // pt.LANES, None)
                acc = acc + out.sum()
            return acc

        dt = bench._slope_time(step, jnp.float32(0.0), rounds=6, verbose=True,
                               label=f"mblock{block_rows}")
        print(f"# block_rows={block_rows}: {dt * 1e3:.3f} ms/pass",
              file=sys.stderr)
        return dt

    for b in list(sizes) + list(sizes)[::-1]:  # down-up-down vs drift
        results.setdefault(b, []).append(measure(b))
    for b in sizes:
        best = min(results[b]) * 1e3
        print(f"RESULT block_rows={b}: {best:.3f} ms")


if __name__ == "__main__":
    main(int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000)
