"""A/B the toroid fast-root seed selection inside ONE process.

The first Pallas execution per process pays the tunnel's Mosaic warmup
(hundreds of seconds, docs/performance.md), so comparing kernel variants
across processes is hopeless. This script pays the warmup once, then
measures the fused-source kernel with (A) the current single-division
numerator/denominator seed pick + rsqrt-reciprocal Newton and (B) the
round-2 two-division rank/select form (reconstructed below and
monkeypatched in), interleaved A, B, A to control drift on the shared chip.

Run: python scripts/bench_ab_seed.py [n_rays]
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
from attosecondraytracing_tpu.ops import surfaces as srf


def _toroid_fast_root_old(surface, q, u, t_eps):
    """Round-2 form: both paraboloid roots divided out, sanitize/rank/select
    chain, Newton update via the VPU divide (pre 'Single-division toroid
    seed selection' commit)."""
    qx, qy, qz = q
    ux, uy, uz = u
    R, r = surface.major_radius, surface.minor_radius
    s1, s2 = srf._paraboloid_seeds(surface, q, u)
    far = jnp.asarray(jnp.inf, dtype=qx.dtype)

    def rank(t):
        t = jnp.where(jnp.isfinite(t), t, -1.0)
        ok = (t > t_eps) & (qz + t * uz < 0.0)
        return jnp.where(ok, t, far), t

    r1, s1 = rank(s1)
    r2, s2 = rank(s2)
    t = jnp.where(r1 <= r2, s1, s2)
    for _ in range(srf._NEWTON_ITERS_TOROID_FAST - 1):
        x, y, z = qx + t * ux, qy + t * uy, qz + t * uz
        g, gp = srf._residual_c(surface, x, y, z, ux, uy, uz)
        t = t - g / jnp.where(jnp.abs(gp) > 1e-12, gp, jnp.inf)
    x, y, z = qx + t * ux, qy + t * uy, qz + t * uz
    inv_rho = jax.lax.rsqrt(jnp.maximum(x * x + z * z, 1e-30))
    w = (x * x + z * z) * inv_rho - R
    s2_ = w * w + y * y
    inv_s = jax.lax.rsqrt(jnp.maximum(s2_, 1e-30))
    g_abs = jnp.abs(s2_ * inv_s - r)
    return t, g_abs, (x, y, z), (inv_rho, inv_s, w)


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

    new_root = srf._toroid_fast_root
    results = {}
    for tag, fn in (("new_1", new_root), ("old", _toroid_fast_root_old),
                    ("new_2", new_root)):
        srf._toroid_fast_root = fn
        jax.clear_caches()  # stale jit entries would reuse the other variant
        results[tag] = measure(tag, n_rays, spec, elements)
    srf._toroid_fast_root = new_root
    new_ms = min(results["new_1"], results["new_2"]) * 1e3
    old_ms = results["old"] * 1e3
    print(f"RESULT new={new_ms:.3f} ms old={old_ms:.3f} ms "
          f"speedup={old_ms / new_ms:.3f}x")


if __name__ == "__main__":
    main(int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000)
