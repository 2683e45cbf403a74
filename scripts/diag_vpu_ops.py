"""Measure VPU op-slot costs inside a Pallas kernel: chains of dependent ops
of each kind on a fixed tile, slope-timed over op count. TPU only."""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from bench import _slope_time  # noqa: E402

LANES, ROWS, BLOCK = 128, 78336, 128  # ~1e7 lanes


def make_kernel(op, n_ops):
    def kernel(x, o):
        v = x[:]
        for i in range(n_ops):
            v = op(v, i)
        o[:] = v
    return kernel


def run(op, n_ops):
    fspec = pl.BlockSpec((BLOCK, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)

    @partial(jax.jit, static_argnames=("reps",))
    def step(x, reps: int):
        acc = jnp.asarray(0.0, jnp.float32)
        for i in range(reps):
            out = pl.pallas_call(
                make_kernel(op, n_ops), grid=(ROWS // BLOCK,),
                in_specs=[fspec], out_specs=fspec,
                out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
            )(x + i * 1e-30)
            acc = acc + out.sum()
        return acc

    x = jnp.full((ROWS, LANES), 1.234, dtype=jnp.float32)
    return _slope_time(step, x, rounds=4, verbose=False)


OPS = {
    "fma": lambda v, i: v * 1.0000001 + 1e-7,
    "mul": lambda v, i: v * 1.0000001,
    "div": lambda v, i: v / (v + 1.0),
    "sqrt": lambda v, i: jnp.sqrt(v + 1.0),
    "rsqrt": lambda v, i: jax.lax.rsqrt(v + 1.0),
    "recip": lambda v, i: 1.0 / (v + 1.0),
    "recip_approx": lambda v, i: pl.reciprocal(v + 1.0, approx=True),
    "select": lambda v, i: jnp.where(v > 0.5, v * 1.0000001, v + 1e-7),
    "abs_cmp": lambda v, i: jnp.abs(v) + (v > 1.0).astype(v.dtype),
}


def main():
    if jax.default_backend() == "cpu":
        raise SystemExit("TPU required")
    lo_ops, hi_ops = 8, 40
    base = run(OPS["fma"], 0)
    print(f"0-op kernel: {base*1e3:.3f} ms (memory floor, 8 B/lane)")
    for name, op in OPS.items():
        t_lo = run(op, lo_ops)
        t_hi = run(op, hi_ops)
        per_op = (t_hi - t_lo) / (hi_ops - lo_ops)
        # ns per op per 1e7 lanes -> slots: 1 fma-slot = 1e7/3.85e12 s
        print(f"{name:14s}: {per_op*1e9/1e7*1e7:8.3f} ns/op/tile "
              f"({per_op / (1e7/0.94e9/8/128/4):6.1f} fma-slots)" if False else
              f"{name:14s}: {per_op*1e3:7.4f} ms per op over 1e7 lanes")


if __name__ == "__main__":
    t0 = time.perf_counter()
    main()
    print(f"# total {time.perf_counter()-t0:.0f}s", file=sys.stderr)
