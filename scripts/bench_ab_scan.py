"""Interleaved A/B: runtime-scalar-pose scan kernel vs baked moment kernel.

VERDICT r4 weak #2: single-pair comparisons of these two kernels have
produced contradictory conclusions (0.769 vs 2.355 ms in one process, 5.734
vs 1.600 ms in another) because run-to-run load on the shared dev chip
exceeds the effect size. This script holds the claim to the same standard
as the round-3 seed change (scripts/bench_ab_seed.py): ONE process, Mosaic
warmup paid once, then the two kernels measured alternately several times —
rt, baked, rt, baked, ... — and the full spread reported, so drift shows up
as within-variant scatter instead of masquerading as a between-variant
difference.

Run: python scripts/bench_ab_scan.py [n_rays] [pairs]
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
from attosecondraytracing_tpu.ops import pallas_scan as psn
from attosecondraytracing_tpu.ops import pallas_trace as pt
from attosecondraytracing_tpu.ops.trace import trace


def build_steps(n_rays: int):
    """(step_scan_rt, step_scan_baked) — the same two step functions
    bench.main measures, built once so both jits stay cached across the
    interleaved rounds."""
    _, elements = bench.build_device(16)
    spec = pt.make_source_spec("cone", np.zeros(3), np.array([1.0, 0, 0]),
                               bench.DIVERGENCE)
    probe = pt.source_bundle(spec, 4096, wavelength=bench.WAVELENGTH)
    det = Detector(np.zeros(3))
    det.autoplace(trace(probe, elements, keep_history=False), 500.0)
    opl_ref, _offsets, inv_dn_chief = pt.chief_ray_refs(
        spec, elements, det.centre, det.normal, (0.0,))
    det_b = pt.bake_detector(elements, det.centre, det.normal,
                             det._plane_rotation(),
                             opl_ref=opl_ref, inv_dn_chief=inv_dn_chief)
    baked_f, maps_f, final_f, premasks_f = pt._source_maps(spec, elements)
    mtile = pt.MOMENT_BLOCK_ROWS * pt.LANES
    n_pad = ((n_rays + mtile - 1) // mtile) * mtile
    rows = n_pad // pt.LANES

    @partial(jax.jit, static_argnames=("reps",))
    def step_baked(phase, reps: int):
        acc = jnp.asarray(0.0, jnp.float32)
        for i in range(reps):
            out = pt._pallas_source_moments_padded(
                phase + i * 1e-7, jnp.float32(0.0), jnp.float32(0.0), spec,
                baked_f, maps_f, final_f, premasks_f, det_b,
                pt.MOMENT_BLOCK_ROWS, False, n_rays, n_rays, rows, None)
            acc = acc + out.sum()
        return acc

    scan_spec = psn.make_scan_spec("cone", elements, n_rays)
    svec = jnp.asarray(psn.scan_chain_scalars(
        elements, np.asarray(spec.rot), np.zeros(3), det.centre, det.normal,
        det._plane_rotation()))
    aux_j = jnp.asarray(
        [opl_ref, inv_dn_chief, 0.0, np.tan(bench.DIVERGENCE), 0.0, 0.0,
         0.0, 0.0], jnp.float32)

    @partial(jax.jit, static_argnames=("reps",))
    def step_rt(phase, reps: int):
        acc = jnp.asarray(0.0, jnp.float32)
        for i in range(reps):
            aux_i = aux_j.at[psn.AUX_PHASE].set(phase + i * 1e-7)
            out = psn._pallas_scan_moments_padded(
                svec, aux_i, scan_spec, False, n_rays, rows)
            acc = acc + out.sum()
        return acc

    return step_rt, step_baked


def main(n_rays=10_000_000, pairs=4):
    t0 = time.perf_counter()
    step_rt, step_baked = build_steps(n_rays)
    bench.warmup_mosaic()
    print(f"# setup+warmup: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    rt, baked = [], []
    for i in range(pairs):
        rt.append(bench._slope_time(step_rt, jnp.float32(0.0), rounds=4,
                                    verbose=(i == 0), label=f"rt_{i}"))
        baked.append(bench._slope_time(step_baked, jnp.float32(0.0), rounds=4,
                                       verbose=(i == 0), label=f"baked_{i}"))
        print(f"# pair {i}: rt {rt[-1]*1e3:.3f} ms, baked {baked[-1]*1e3:.3f} ms",
              file=sys.stderr)

    def spread(xs):
        ms = np.asarray(xs) * 1e3
        return f"min {ms.min():.3f} / med {np.median(ms):.3f} / max {ms.max():.3f} ms"

    med_rt = float(np.median(rt)) * 1e3
    med_baked = float(np.median(baked)) * 1e3
    print(f"RESULT runtime-scalar: {spread(rt)}")
    print(f"RESULT baked-constant: {spread(baked)}")
    print(f"RESULT median ratio rt/baked = {med_rt / med_baked:.3f} "
          f"(interleaved, {pairs} pairs, one process)")


if __name__ == "__main__":
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    main(n, p)
