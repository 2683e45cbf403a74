"""Compare the fused Pallas whole-chain kernel vs the XLA trace path on the
flagship 2-toroidal chain. Slope timing (k_hi - k_lo dispatches) to amortize
the tunnel RPC overhead, fetch-synced like bench.py."""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def main(n_rays=10_000_000, iters=6):
    if jax.default_backend() != "tpu":
        raise SystemExit(
            "TPU required: this script compiles the fused kernel with "
            "interpret=False (use ops.pallas_trace.pallas_trace for the "
            "CPU-interpreted fallback)"
        )
    from bench import build_device, _slope_time
    from attosecondraytracing_tpu.ops.trace import trace
    from attosecondraytracing_tpu.ops import pallas_trace as pt

    source, elements = build_device(n_rays)
    print(f"# built, n={n_rays}", file=sys.stderr)

    baked, maps, final, premasks = pt._static_chain(elements)
    tile = 512 * pt.LANES  # pad so every swept block_rows divides the rows
    n_pad = ((n_rays + tile - 1) // tile) * tile

    # pre-reshape components once (outside timing, matches bench's on-device source)
    def prep(x, fill=0.0):
        x = jnp.asarray(x)
        x = jnp.pad(x, (0, n_pad - n_rays), constant_values=fill)
        return x.reshape(n_pad // pt.LANES, pt.LANES)

    comps6 = (
        prep(source.p[..., 0]), prep(source.p[..., 1]), prep(source.p[..., 2]),
        prep(source.d[..., 0]), prep(source.d[..., 1]), prep(source.d[..., 2], 1.0),
    )
    comps10 = comps6 + (
        prep(source.opl), prep(source.opl_c),
        prep(source.alive.astype(jnp.int8)), prep(source.incidence),
    )
    comps6, comps10 = jax.block_until_ready((comps6, comps10))

    def make_step_pallas(block_rows, fresh):
        @partial(jax.jit, static_argnames=("reps",))
        def step_pallas(comps, reps):
            acc = jnp.asarray(0.0, jnp.float32)
            for i in range(reps):
                c = (comps[0] + (i + 1) * 1e-30,) + comps[1:]
                outs = pt._pallas_trace_padded(c, baked, maps, final, premasks, block_rows,
                                               False, fresh=fresh, n_rays=n_rays)
                for o in outs:
                    acc = acc + o.astype(jnp.float32).sum()
            return acc
        return step_pallas

    @partial(jax.jit, static_argnames=("reps",))
    def step_xla(source, reps):
        acc = jnp.asarray(0.0, dtype=source.p.dtype)
        for i in range(reps):
            src = source._replace(p=source.p + (i + 1) * 1e-30)
            out = trace(src, elements, keep_history=False)
            w = out.alive.astype(out.p.dtype) * out.intensity
            acc = (acc + out.opl.sum() + out.incidence.sum() + out.d.sum()
                   + out.p.sum() + w.sum())
        return acc

    # same fusion-window option bench.py uses for the XLA path
    opts = {"xla_jf_fusion_max_instruction_count_for_window_config": "4000"}
    compiled_xla = {}

    def step_xla_compiled(src, reps):
        if reps not in compiled_xla:
            compiled_xla[reps] = (
                jax.jit(lambda s: step_xla(s, reps)).lower(src).compile(compiler_options=opts)
            )
        return compiled_xla[reps](src)

    def bench_fn(fn, arg, label):
        dt = _slope_time(fn, arg, rounds=iters, label=label)
        print(f"{label}: {dt*1e3:.3f} ms/trace -> {n_rays/dt/1e9:.3f} Grays/s")
        return dt

    for br in (32, 64, 128, 256, 512):
        bench_fn(make_step_pallas(br, True), comps6, f"pallas fresh br={br}")
    bench_fn(make_step_pallas(128, False), comps10, "pallas strm  br=128")
    bench_fn(step_xla_compiled, source, "xla                ")


if __name__ == "__main__":
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    main(n)
