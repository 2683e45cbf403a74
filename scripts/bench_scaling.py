"""Multi-device scaling harness: rays/s on a 1/2/4/8-device ('rays',) mesh.

Measures weak-scaling efficiency of the sharded trace (fixed rays *per
device*, BASELINE.md's ">= 90% linear rays/s scaling" target) and verifies
compute locality: the compiled HLO of the sharded trace must contain **no
collectives** — rays never interact, so communication may only appear once a
cross-ray reduction (detector statistics) is taken.

Run on a real TPU slice:
    python scripts/bench_scaling.py                  # all local devices
On a development box, the same code runs on virtual CPU devices:
    python scripts/bench_scaling.py --virtual 8
Virtual devices share the host's physical cores, so the *efficiency* numbers
are only meaningful on real hardware; the harness prints the backend so the
two cannot be confused. The collective-locality check is meaningful on both.

Output: a human-readable table on stdout + one JSON line (machine-readable)
with per-mesh-size throughput and efficiency.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (development mode)")
    ap.add_argument("--rays-per-device", type=float, default=2e6)
    ap.add_argument("--iters", type=int, default=5)
    return ap.parse_args()


ARGS = parse_args()
if ARGS.virtual:
    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={ARGS.virtual}"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (env vars must be set first)

if ARGS.virtual:
    # the axon TPU plugin ignores JAX_PLATFORMS; this config knob works
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
               "collective-permute")


def hlo_collectives(compiled) -> list[str]:
    txt = compiled.as_text()
    return [c for c in COLLECTIVES if c in txt]


def hlo_nonscalar_collectives(compiled, max_elems: int = 128) -> list[str]:
    """HLO lines where a collective op's result has more than ``max_elems``
    elements — i.e. ray-shaped state crossing devices (a sharding bug for a
    pure trace; rays never interact)."""
    import re

    bad = []
    for line in compiled.as_text().splitlines():
        m = re.search(r"=\s*\(?[a-z0-9]+\[([\d,]*)\]", line)
        if m is None or not any(f" {c}(" in line or f"{c}-start" in line
                                for c in COLLECTIVES):
            continue
        dims = [int(d) for d in m.group(1).split(",") if d]
        n = int(np.prod(dims)) if dims else 1
        if n > max_elems:
            bad.append(line.strip()[:120])
    return bad


def main():
    from bench import build_device
    from attosecondraytracing_tpu.parallel import mesh as pmesh
    from attosecondraytracing_tpu.ops.trace import trace
    from attosecondraytracing_tpu.analysis import stats

    devices = jax.devices()
    n_max = len(devices)
    backend = jax.default_backend()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_max]
    print(f"# backend={backend}, devices={n_max}, sizes={sizes}", file=sys.stderr)

    results = []
    base_per_dev = None
    for n_dev in sizes:
        n_rays = int(ARGS.rays_per_device) * n_dev  # weak scaling
        mesh = pmesh.make_mesh(rays=n_dev, scan=1, devices=devices[:n_dev])
        source, elements = build_device(n_rays)
        src = pmesh.shard_bundle(source, mesh, axis="rays")
        els = jax.device_put(elements, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))

        def step(src, els, reps: int):
            acc = jnp.asarray(0.0, dtype=src.p.dtype)
            for i in range(reps):
                s = src._replace(p=src.p + (i + 1) * 1e-30)
                out = trace(s, els, keep_history=False)
                w = out.alive.astype(out.p.dtype) * out.intensity
                acc = (acc + out.opl.sum() + out.incidence.sum() + out.d.sum()
                       + out.p.sum() + w.sum())
            return acc

        k_lo, k_hi = 1, 3
        compiled = {}
        for reps in (k_lo, k_hi):
            lowered = jax.jit(lambda s, e: step(s, e, reps)).lower(src, els)
            compiled[reps] = lowered.compile()

        # locality: tracing sharded rays must not communicate. The scalar
        # accumulator IS a cross-device reduction on n_dev > 1, so a scalar
        # all-reduce is expected; any collective over (N,)-shaped ray state
        # is a sharding bug.
        colls = hlo_collectives(compiled[k_lo])
        bad_colls = hlo_nonscalar_collectives(compiled[k_lo])

        def timed(reps: int) -> float:
            t0 = time.perf_counter()
            v = float(compiled[reps](src, els))
            assert np.isfinite(v)
            return time.perf_counter() - t0

        timed(k_lo); timed(k_hi)  # warmup
        dt = float("inf")
        for _ in range(ARGS.iters):
            dt = min(dt, (timed(k_hi) - timed(k_lo)) / (k_hi - k_lo))
        rays_per_s = n_rays / dt
        per_dev = rays_per_s / n_dev
        if base_per_dev is None:
            base_per_dev = per_dev
        eff = per_dev / base_per_dev
        results.append({
            "devices": n_dev,
            "n_rays": n_rays,
            "rays_per_s": rays_per_s,
            "per_device": per_dev,
            "efficiency": eff,
            "collectives": colls,
            "nonscalar_collectives": bad_colls,
        })
        print(f"devices={n_dev:3d}  rays={n_rays:.1e}  {rays_per_s:.3e} rays/s"
              f"  per-dev {per_dev:.3e}  eff {eff*100:6.1f}%  collectives={colls}")
        assert not bad_colls, (
            "sharded trace communicates non-scalar ray state — sharding bug:\n"
            + "\n".join(bad_colls))

    # sanity: taking detector statistics SHOULD introduce a collective
    mesh = pmesh.make_mesh(rays=min(2, n_max), scan=1, devices=devices[:min(2, n_max)])
    source, elements = build_device(int(ARGS.rays_per_device))
    src = pmesh.shard_bundle(source, mesh, axis="rays")
    els = jax.device_put(elements, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))

    def stat_step(src, els):
        out = trace(src, els, keep_history=False)
        return stats.energy_transmission(src, out)

    compiled_stats = jax.jit(stat_step).lower(src, els).compile()
    stat_colls = hlo_collectives(compiled_stats)
    if min(2, n_max) > 1:
        print(f"# detector-stats step collectives (expected non-empty): {stat_colls}",
              file=sys.stderr)

    print(json.dumps({
        "metric": "scaling_efficiency",
        "backend": backend,
        "weak_scaling": results,
        "stats_collectives": stat_colls,
    }))


if __name__ == "__main__":
    main()
