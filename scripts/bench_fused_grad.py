"""Measure the fused alignment-gradient engine (ops/pallas_grad.py).

Reports, on the flagship 3-element chain (P = 18 pose parameters):
* per-step wall time and kernel-pass count at 1e7 rays (single chunk) for
  tangent batch G = 1 (the round-3 one-pass-per-parameter scheme) vs the
  shared-primal G = 6 batching — the VERDICT r3 #2 "step cost <= (P/G + 1)
  passes" measurement;
* a billion-ray chunked gradient (120 chunks x ceil(P/G) passes of the same
  compiled kernel) — the round-3 module goal ("a billion-ray alignment
  gradient costs P fused passes") actually demonstrated.

Run on the TPU; prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(n_small: int = 10_000_000, n_giga: int = 1_000_000_000):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_chain, _to_f32

    from attosecondraytracing_tpu.analysis import alignment as al
    from attosecondraytracing_tpu.models.detector import Detector
    from attosecondraytracing_tpu.ops import pallas_grad as pg
    from attosecondraytracing_tpu.ops import pallas_trace as pt
    from attosecondraytracing_tpu.ops.trace import trace_jit

    import bench

    bench.warmup_mosaic()

    chain = _flagship_chain(4096)
    elements = _to_f32(chain.device_elements())
    info = chain.source_spec
    baked_src = info.baked()
    det = Detector(chain.optical_elements[-1].position)
    probe = pt.source_bundle(baked_src, 4096, wavelength=80e-6)
    det.autoplace(trace_jit(probe, elements, keep_history=False), 495.0)
    det_rot = det._plane_rotation()

    params = al.zero_params(len(elements), dtype=jnp.float32)
    params = params._replace(
        angles=params.angles.at[1, 0].set(2e-4),
        shifts=params.shifts.at[1, 0].set(0.05))
    P = 6 * len(elements)

    def run(n_rays, batch, reps=1):
        spec = pg.make_loss_spec(
            info._replace(n_rays=n_rays, gaussian_edge=float(np.exp(-2.0))),
            elements, det.centre, det.normal)
        saved = pg.TANGENT_BATCH
        pg.TANGENT_BATCH = batch
        try:
            # compile + first run
            t0 = time.perf_counter()
            loss, grads = pg.fused_focus_value_and_grad(
                params, spec, elements, np.asarray(baked_src.rot),
                np.asarray(info.origin), det.centre, det.normal, det_rot)
            compile_s = time.perf_counter() - t0
            best = np.inf
            for _ in range(reps):
                t0 = time.perf_counter()
                loss, grads = pg.fused_focus_value_and_grad(
                    params, spec, elements, np.asarray(baked_src.rot),
                    np.asarray(info.origin), det.centre, det.normal, det_rot)
                best = min(best, time.perf_counter() - t0)
        finally:
            pg.TANGENT_BATCH = saved
        n_chunks = -(-n_rays // pg.GRAD_CHUNK)
        passes = n_chunks * (-(-P // batch))
        return float(loss), best, compile_s, passes

    out = {"metric": "fused_grad", "P": P}
    loss, t_g1, c_g1, p_g1 = run(n_small, 1, reps=3)
    out["small_G1"] = {"n_rays": n_small, "step_s": round(t_g1, 3),
                      "passes": p_g1, "compile_s": round(c_g1, 1)}
    loss6, t_g6, c_g6, p_g6 = run(n_small, 6, reps=3)
    out["small_G6"] = {"n_rays": n_small, "step_s": round(t_g6, 3),
                      "passes": p_g6, "compile_s": round(c_g6, 1)}
    out["G6_speedup_vs_G1"] = round(t_g1 / t_g6, 2)
    assert abs(loss - loss6) < 1e-3 * max(abs(loss), 1e-9), (loss, loss6)

    lossg, t_giga, c_giga, p_giga = run(n_giga, 6, reps=1)
    out["giga_G6"] = {"n_rays": n_giga, "step_s": round(t_giga, 2),
                      "passes": p_giga, "compile_s": round(c_giga, 1),
                      "ray_grad_evals_per_s": round(n_giga * P / t_giga, 0)}
    out["giga_loss"] = lossg
    print(json.dumps(out))


if __name__ == "__main__":
    main(
        int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000,
        int(float(sys.argv[2])) if len(sys.argv) > 2 else 1_000_000_000,
    )
