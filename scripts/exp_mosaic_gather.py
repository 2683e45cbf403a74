"""Probe: can Mosaic lower the per-lane gathers a grid-defect bilinear
lookup needs? (VERDICT r3 #3 "if Mosaic genuinely can't" branch.)

Tries increasingly demanding forms on a (512, 512) f32 VMEM-resident map
with (8, 128) runtime indices and reports which compile AND return correct
values. If the 2D form works, ops/pallas_trace can take Fourrier/
MeasuredMap defects in-kernel; if not, docs/performance.md documents the
measured limitation and chains keep the XLA fused-source engine.
"""

import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 512
rng = np.random.default_rng(0)
GRID = rng.standard_normal((N, N)).astype(np.float32)
X = rng.uniform(0, 1, (8, 128)).astype(np.float32)
Y = rng.uniform(0, 1, (8, 128)).astype(np.float32)


def run(name, kernel, check):
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            interpret=jax.default_backend() == "cpu",
        )(GRID, X, Y)
        ok = np.allclose(np.asarray(out), check, atol=1e-5)
        print(f"{name}: COMPILED, correct={ok}")
        return ok
    except Exception as exc:
        msg = str(exc).splitlines()[0][:140] if str(exc) else type(exc).__name__
        print(f"{name}: FAILED ({type(exc).__name__}: {msg})")
        return False


def idx(a):
    return np.clip(np.floor(a * (N - 1)).astype(np.int32), 0, N - 2)


IX, IY = idx(X), idx(Y)


def k_row_gather(g, x, y, o):
    """1D gather along rows: g[ix, 0] per lane."""
    ix = jnp.clip(jnp.floor(x[:] * (N - 1)).astype(jnp.int32), 0, N - 2)
    o[:] = g[ix, jnp.zeros_like(ix)]


def k_2d_gather(g, x, y, o):
    ix = jnp.clip(jnp.floor(x[:] * (N - 1)).astype(jnp.int32), 0, N - 2)
    iy = jnp.clip(jnp.floor(y[:] * (N - 1)).astype(jnp.int32), 0, N - 2)
    o[:] = g[ix, iy]


def k_flat_take(g, x, y, o):
    ix = jnp.clip(jnp.floor(x[:] * (N - 1)).astype(jnp.int32), 0, N - 2)
    iy = jnp.clip(jnp.floor(y[:] * (N - 1)).astype(jnp.int32), 0, N - 2)
    flat = g[:].reshape(-1)
    o[:] = jnp.take(flat, ix * N + iy, axis=0)


def k_bilinear(g, x, y, o):
    fx = x[:] * (N - 1)
    fy = y[:] * (N - 1)
    ix = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, N - 2)
    iy = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, N - 2)
    wx = fx - ix
    wy = fy - iy
    gg = g[:]
    g00 = gg[ix, iy]
    g10 = gg[ix + 1, iy]
    g01 = gg[ix, iy + 1]
    g11 = gg[ix + 1, iy + 1]
    o[:] = (g00 * (1 - wx) * (1 - wy) + g10 * wx * (1 - wy)
            + g01 * (1 - wx) * wy + g11 * wx * wy)


def bilinear_ref():
    fx = X * (N - 1)
    fy = Y * (N - 1)
    ix, iy = idx(X), idx(Y)
    wx, wy = fx - ix, fy - iy
    return (GRID[ix, iy] * (1 - wx) * (1 - wy) + GRID[ix + 1, iy] * wx * (1 - wy)
            + GRID[ix, iy + 1] * (1 - wx) * wy + GRID[ix + 1, iy + 1] * wx * wy)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    results = {}
    results["row_gather"] = run("row_gather", k_row_gather, GRID[IX, 0])
    results["2d_gather"] = run("2d_gather", k_2d_gather, GRID[IX, IY])
    results["flat_take"] = run("flat_take", k_flat_take, GRID[IX, IY])
    results["bilinear"] = run("bilinear", k_bilinear, bilinear_ref())
    print(results)


# --- follow-up probes: which gather forms DOES Mosaic lower? ---------------

def probe_take_along():
    import functools

    results = {}

    def try_one(name, operand_shape, fn, ref_fn):
        op = rng.standard_normal(operand_shape).astype(np.float32)
        try:
            out = pl.pallas_call(
                functools.partial(fn),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(ref_fn(op).shape, jnp.float32),
                interpret=jax.default_backend() == "cpu",
            )(op)
            ok = np.allclose(np.asarray(out), ref_fn(op), atol=1e-5)
            print(f"{name}: COMPILED, correct={ok}")
            results[name] = ok
        except Exception as exc:
            msg = str(exc).splitlines()[0][:120] if str(exc) else ""
            print(f"{name}: FAILED ({type(exc).__name__}: {msg})")
            results[name] = False
        return results

    # fixed index patterns (deterministic from iota) so ref is computable
    def k_taa_last(g, o):
        # per-element gather along the LAST axis: idx[s,l] = (l*7+s) % ncols
        s_ = jax.lax.broadcasted_iota(jnp.int32, o.shape, 0)
        l_ = jax.lax.broadcasted_iota(jnp.int32, o.shape, 1)
        idx_ = (l_ * 7 + s_) % g.shape[1]
        o[:] = jnp.take_along_axis(g[:], idx_, axis=1)

    def ref_taa_last(op):
        s_, l_ = np.indices((op.shape[0], op.shape[1]))
        return op[s_, (l_ * 7 + s_) % op.shape[1]]

    def k_taa_first(g, o):
        s_ = jax.lax.broadcasted_iota(jnp.int32, o.shape, 0)
        l_ = jax.lax.broadcasted_iota(jnp.int32, o.shape, 1)
        idx_ = (s_ * 13 + l_) % g.shape[0]
        o[:] = jnp.take_along_axis(g[:], idx_, axis=0)

    def ref_taa_first(op):
        s_, l_ = np.indices((op.shape[0], op.shape[1]))
        return op[(s_ * 13 + l_) % op.shape[0], l_]

    try_one("taa_axis1_8x128", (8, 128), k_taa_last, ref_taa_last)
    try_one("taa_axis1_8x512", (8, 512), k_taa_last, ref_taa_last)
    try_one("taa_axis0_128x128", (128, 128), k_taa_first, ref_taa_first)
    try_one("taa_axis0_512x128", (512, 128), k_taa_first, ref_taa_first)
    print(results)
    return results


if __name__ == "__main__" and True:
    probe_take_along()
