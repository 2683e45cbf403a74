"""Which gather layout is fastest for grid-defect interpolation on TPU?

The xla-source defect engine spends its time in 12 bilinear gathers per ray
(height + 2 slope maps x 4 corners, ops/defects._bilinear). XLA lowers 2-D
``grid[ix, iy]`` gathers on TPU, but how it lowers them (dynamic-slice loop
vs one-hot matmul vs native gather) and what that costs vs alternatives is
an empirical question. Candidates, all computing the same bilinear value:

  a) grid2d   — current form: ``grid[ix, iy]`` x 12
  b) flat1d   — ``grid.ravel()[ix * ny + iy]`` x 12 (1-D gather)
  c) packed   — maps stacked (Nx*Ny, 3); 4 corner gathers of 3-wide rows
  d) onehot   — corner values via one-hot matmul over the minor axis
                (ix exact rows via take, iy via one-hot dot) — MXU-shaped

Run: python scripts/exp_gather_layouts.py [n_rays] [grid_side]
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


def main(n=1_000_000, side=1600):
    rng = np.random.default_rng(0)
    maps = jnp.asarray(rng.standard_normal((3, side, side)), jnp.float32)
    packed = jnp.asarray(np.moveaxis(np.asarray(maps), 0, -1).reshape(side * side, 3))
    x = jnp.asarray(rng.uniform(0, side - 1.001, n), jnp.float32)
    y = jnp.asarray(rng.uniform(0, side - 1.001, n), jnp.float32)
    jax.block_until_ready((maps, packed, x, y))

    def idx_weights(x, y):
        ix = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, side - 2)
        iy = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, side - 2)
        wx = x - ix
        wy = y - iy
        return ix, iy, wx, wy

    def bil(c00, c10, c01, c11, wx, wy):
        return (c00 * (1 - wx) * (1 - wy) + c10 * wx * (1 - wy)
                + c01 * (1 - wx) * wy + c11 * wx * wy)

    def grid2d(x, y):
        ix, iy, wx, wy = idx_weights(x, y)
        out = 0.0
        for k in range(3):
            g = maps[k]
            out += bil(g[ix, iy], g[ix + 1, iy], g[ix, iy + 1],
                       g[ix + 1, iy + 1], wx, wy)
        return out

    def flat1d(x, y):
        ix, iy, wx, wy = idx_weights(x, y)
        base = ix * side + iy
        out = 0.0
        for k in range(3):
            g = maps[k].ravel()
            out += bil(g[base], g[base + side], g[base + 1],
                       g[base + side + 1], wx, wy)
        return out

    def packed_rows(x, y):
        ix, iy, wx, wy = idx_weights(x, y)
        base = ix * side + iy
        c00 = packed[base]          # (n, 3)
        c10 = packed[base + side]
        c01 = packed[base + 1]
        c11 = packed[base + side + 1]
        v = bil(c00, c10, c01, c11, wx[:, None], wy[:, None])
        return v.sum(axis=1)

    variants = {"grid2d": grid2d, "flat1d": flat1d, "packed": packed_rows}

    # correctness cross-check on a small slice
    ref = np.asarray(grid2d(x[:1024], y[:1024]))
    for name, fn in variants.items():
        got = np.asarray(fn(x[:1024], y[:1024]))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    overhead = bench.measure_overhead()
    for name, fn in variants.items():
        @partial(jax.jit, static_argnames=("reps",))
        def step(xy, reps: int, fn=fn):
            x, y = xy
            acc = jnp.float32(0.0)
            for i in range(reps):
                acc = acc + fn(x + i * 1e-6, y).sum()
            return acc

        dt = bench._slope_time(step, (x, y), rounds=5, verbose=False, label=name)
        direct = None
        t0 = time.perf_counter()
        float(step((x, y), 8))
        direct = (time.perf_counter() - t0 - overhead) / 8
        print(f"{name}: slope {dt*1e3:.2f} ms, direct {direct*1e3:.2f} ms "
              f"per {n:.0e}-ray x 3-map bilinear")


if __name__ == "__main__":
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 1600
    main(n, s)
