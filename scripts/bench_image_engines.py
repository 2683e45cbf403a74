"""A/B the two giga-ray image engines on hardware (VERDICT r4 #8).

engine='pallas': Mosaic fused-source trace -> bundle in HBM -> XLA binning
(the traced state makes a ~600 MB write+read round trip per 2^23-ray chunk
because Mosaic lowers no scatter). engine='xla-source': synthesis + trace +
scatter-add binning in ONE XLA program — no intermediate bundle.

Interleaved x, p, x, p ... on one process (same standard as
scripts/bench_ab_seed.py); wall-clock per full image, result-fetch synced.

Run: python scripts/bench_image_engines.py [n_rays] [pairs] [bins]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
from attosecondraytracing_tpu.analysis.gigascan import fused_source_images
from attosecondraytracing_tpu.models.detector import Detector
from attosecondraytracing_tpu.ops import pallas_trace as pt
from attosecondraytracing_tpu.ops.trace import trace_jit


def build():
    from __graft_entry__ import _flagship_chain, _to_f32

    chain = _flagship_chain(16)
    elements = _to_f32(chain.device_elements())
    spec = chain.source_spec
    out = trace_jit(pt.source_bundle(spec.baked(), 65536,
                                     wavelength=spec.wavelength), elements)
    det = Detector(chain.optical_elements[-1].position)
    det.autoplace(out, 500.0)
    return spec, elements, det


def run_once(engine, spec, elements, det, n_total, bins, extent):
    t0 = time.perf_counter()
    res = fused_source_images(spec, elements, det, n_total=n_total,
                              bins=(bins, bins), extent=extent, engine=engine)
    assert np.isfinite(res["sum_w"]) and res["sum_w"] > 0
    return time.perf_counter() - t0, res


def main(n_total=100_000_000, pairs=3, bins=256):
    spec, elements, det = build()
    bench.warmup_mosaic()
    # fixed extent for both engines (and to keep the probe out of the timing)
    probe = fused_source_images(spec, elements, det, n_total=1 << 17,
                                bins=(bins, bins))
    extent = probe["extent"]

    results = {"pallas": [], "xla-source": []}
    ref_img = {}
    for i in range(pairs + 1):  # +1: first pair absorbs both compiles
        for eng in ("xla-source", "pallas"):
            dt, res = run_once(eng, spec, elements, det, n_total, bins, extent)
            if i == 0:
                ref_img[eng] = res["image"]
                print(f"# {eng} compile+first image: {dt:.1f}s", file=sys.stderr)
                continue
            results[eng].append(dt)
            print(f"# pair {i} {eng}: {dt:.2f}s "
                  f"({n_total/dt/1e9:.2f} Grays/s binned)", file=sys.stderr)

    # same physics from both engines
    d = np.abs(ref_img["pallas"] - ref_img["xla-source"]).sum()
    assert d < 0.01 * ref_img["pallas"].sum(), "engines disagree on the image"

    for eng, ts in results.items():
        ms = np.asarray(ts)
        print(f"RESULT {eng}: min {ms.min():.2f} / med {np.median(ms):.2f} / "
              f"max {ms.max():.2f} s per {n_total:.0e}-ray {bins}^2 image "
              f"({n_total/np.median(ms)/1e9:.2f} Grays/s median)")
    ratio = np.median(results["pallas"]) / np.median(results["xla-source"])
    print(f"RESULT pallas/xla-source median ratio = {ratio:.2f}x "
          f"({pairs} interleaved pairs, one process)")


if __name__ == "__main__":
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000_000
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    main(n, p, b)
