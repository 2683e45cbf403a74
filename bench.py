"""Headline benchmark: rays/s through the 2-toroidal grazing-incidence chain.

BASELINE.md target: >= 1e9 rays/s/chip through a 2-element toroidal chain
with a 1e7-ray bundle (the reference traces ~1e3 rays in seconds-level pure
Python). Prints ONE JSON line:
  {"metric": "rays_per_second", "value": N, "unit": "rays/s", "vs_baseline": N/1e9}
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(n_rays: int):
    from __graft_entry__ import _flagship_chain, _to_f32

    chain = _flagship_chain(n_rays)
    return _to_f32(chain.source_rays), _to_f32(chain.device_elements())


def build_device(n_rays: int):
    """Flagship chain with the source bundle synthesized *on device*: the
    Vogel-spiral cone is pure math from arange, so there is no reason to
    build 400 MB on the host and push it through the (slow, shared) TPU
    tunnel. Elements stay as host NumPy (they enter jit as baked constants or
    one packed transfer; per-leaf device_put costs one tunnel RPC per tiny
    leaf)."""
    from __graft_entry__ import _flagship_chain, _to_f32
    from attosecondraytracing_tpu.ops.bundle import RayBundle

    chain = _flagship_chain(16)  # placement/elements only
    elements = _to_f32(chain.device_elements())

    divergence = 50e-3 / 2
    wavelength = 80e-6

    @jax.jit
    def make_source():
        dt = jnp.float32
        k = jnp.arange(n_rays, dtype=dt)
        golden = np.pi * (3.0 - np.sqrt(5.0))
        r = jnp.sqrt(k / n_rays) * np.tan(divergence)
        th = golden * k
        # cone around +z, then rotate z->x (the flagship source axis)
        cx = r * jnp.cos(th)
        cy = r * jnp.sin(th)
        inv = jax.lax.rsqrt(cx * cx + cy * cy + 1.0)
        # rotation z->x maps (x,y,z) -> (z, y, -x)
        d = jnp.stack([inv, cy * inv, -cx * inv], axis=-1)
        # Gaussian intensity vs angle, 1/e^2 at the edge (tan(angle) = r)
        ang = jnp.arctan(r)
        intensity = jnp.exp((jnp.tan(ang) / np.tan(divergence)) ** 2 * np.log(1 / np.e**2))
        zeros = jnp.zeros((n_rays,), dtype=dt)
        return RayBundle(
            p=jnp.zeros((n_rays, 3), dtype=dt),
            d=d,
            opl=zeros,
            opl_c=zeros,
            alive=jnp.ones((n_rays,), dtype=bool),
            intensity=intensity,
            incidence=zeros,
            wavelength=jnp.asarray(wavelength, dtype=dt),
        )

    source = make_source()
    jax.block_until_ready(source)
    return source, elements


def main(n_rays: int = 10_000_000, iters: int = 6, verbose: bool = True):
    from attosecondraytracing_tpu.ops.trace import trace

    t_start = time.perf_counter()
    source, elements = build_device(n_rays)
    if verbose:
        print(f"# build (on device): {time.perf_counter() - t_start:.1f}s", file=sys.stderr)

    from functools import partial

    @partial(jax.jit, static_argnames=("reps",))
    def step(source, reps: int):
        # elements are closed over -> baked into the executable (no per-call
        # transfers). reps traces are UNROLLED inside one dispatch (a
        # lax.fori_loop would serialize scheduling and cost ~2x); the
        # per-iteration source perturbation defeats CSE across iterations.
        # The consume touches every physical output so none of the trace
        # gets dead-code-eliminated.
        acc = jnp.asarray(0.0, dtype=source.p.dtype)
        for i in range(reps):
            # perturb positions: they feed every intersection, so no
            # iteration can be folded into another
            src = source._replace(p=source.p + (i + 1) * 1e-30)
            out = trace(src, elements, keep_history=False)
            # full reductions over every physical output: anything narrower
            # lets XLA slice-push or dead-code the trace away
            w = out.alive.astype(out.p.dtype) * out.intensity
            acc = (acc + out.opl.sum() + out.incidence.sum() + out.d.sum()
                   + out.p.sum() + w.sum())
        return acc

    # TPU compiler tuning: the default fusion-window instruction budget
    # splits this (long, purely elementwise) chain into ~30 fusions that
    # bounce ~10 GB of ray state through HBM; raising it keeps more of the
    # chain in registers/VMEM (measured 10.4 -> 6.9 ms/trace on v5e).
    opts = {"xla_jf_fusion_max_instruction_count_for_window_config": "4000"}
    compiled = {}

    def get_compiled(reps: int):
        if reps not in compiled:
            lowered = jax.jit(lambda s: step(s, reps)).lower(source)
            try:
                compiled[reps] = lowered.compile(compiler_options=opts)
            except Exception:
                # non-TPU backends reject TPU compilation-environment options
                compiled[reps] = lowered.compile()
        return compiled[reps]

    def timed(reps: int) -> float:
        """Fetch-synced wall time of one dispatch of `reps` traces.

        IMPORTANT: on the tunneled TPU platform `jax.block_until_ready`
        returns before execution finishes, so we sync by fetching the scalar
        result value (float() forces a literal transfer, which cannot
        complete before the computation has)."""
        t0 = time.perf_counter()
        v = float(get_compiled(reps)(source))
        assert np.isfinite(v)
        return time.perf_counter() - t0

    k_lo, k_hi = 1, 5
    # warmup/compile both rep counts
    t0 = time.perf_counter()
    timed(k_lo)
    timed(k_hi)
    if verbose:
        print(f"# compile+first runs: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # slope timing: per-trace time = (t(k_hi) - t(k_lo)) / (k_hi - k_lo).
    # This amortizes away the fixed per-dispatch RPC/launch/fetch overhead
    # (~25-30 ms through the tunnel, an artifact of the dev-environment
    # tunnel, not the chip) and measures sustained on-chip throughput — the
    # metric that matters for production tracing, where many traces stream
    # through per dispatch. Best-of to reject interference on the shared
    # device.
    dt = float("inf")
    for _ in range(iters):
        t_lo = timed(k_lo)
        t_hi = timed(k_hi)
        dt = min(dt, (t_hi - t_lo) / (k_hi - k_lo))

    rays_per_s = n_rays / dt
    print(
        json.dumps(
            {
                "metric": "rays_per_second",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / 1e9,
            }
        )
    )
    return rays_per_s


if __name__ == "__main__":
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    main(n, it)
