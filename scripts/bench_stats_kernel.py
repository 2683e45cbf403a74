"""Throughput of the fused trace->detector-statistics kernel: full pipeline
(source synthesis + trace + detector projection + weighted moments) with only
O(n_programs) bytes written. TPU only."""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import DIVERGENCE, _slope_time, build_device  # noqa: E402
from attosecondraytracing_tpu.models.detector import Detector  # noqa: E402
from attosecondraytracing_tpu.ops import pallas_trace as pt  # noqa: E402
from attosecondraytracing_tpu.ops.trace import trace  # noqa: E402

N = 10_000_000


def main():
    if jax.default_backend() == "cpu":
        raise SystemExit("TPU required")
    _, elements = build_device(16)
    spec = pt.make_source_spec("cone", np.zeros(3), np.array([1.0, 0, 0]), DIVERGENCE)

    # detector from a small probe trace
    probe = pt.source_bundle(spec, 4096, wavelength=80e-6)
    out = trace(probe, elements, keep_history=False)
    det = Detector(np.zeros(3))
    det.autoplace(out, 500.0)

    for J in (1, 20):
        distances = tuple(np.linspace(-10, 10, J)) if J > 1 else (0.0,)
        kw = dict(det_centre=det.centre, det_normal=det.normal,
                  det_rot=det._plane_rotation(), distances=distances)

        # jit wrapper around the padded call so reps unroll in one dispatch
        det_b = pt.bake_detector(elements, det.centre, det.normal,
                                 det._plane_rotation(), distances,
                                 opl_ref=2000.0,
                                 delay_offsets=tuple(-d for d in distances))
        baked, maps, final, premasks = pt._source_maps(spec, elements)
        tile = pt.BLOCK_ROWS * pt.LANES
        n_pad = ((N + tile - 1) // tile) * tile

        @partial(jax.jit, static_argnames=("reps",))
        def step(phase, reps: int, _det=det_b):
            acc = jnp.asarray(0.0, jnp.float32)
            for i in range(reps):
                outs = pt._pallas_source_stats_padded(
                    phase + i * 1e-7, 0.0, spec, baked, maps, final, premasks,
                    _det, pt.BLOCK_ROWS, False, N, N, n_pad // pt.LANES, None)
                for o in outs:
                    acc = acc + o.sum()
            return acc

        dt = _slope_time(step, jnp.float32(0.0), rounds=6, verbose=False)
        print(f"J={J:2d} distances: {dt*1e3:7.3f} ms/pass  "
              f"{N/dt/1e9:6.2f} Grays/s  "
              f"{J*N/dt/1e9:7.2f} Gray-distance-evals/s")

    # sanity: one real wrapper call end to end
    res = pt.pallas_source_detector_stats(spec, elements, 1_000_000, **kw)
    print("sanity spot_sd[:3]:", res["spot_sd"][:3], "sum_w:", res["sum_w"][0])


if __name__ == "__main__":
    main()
