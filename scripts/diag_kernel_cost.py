"""Decompose the fused-kernel trace time: HBM floor vs per-element compute.

Times the pallas fresh-source kernel over subsets of the flagship chain
(mask / 1 toroid / 2 toroids / full) plus a pure passthrough kernel with the
same streams, so the cost splits into (memory floor) + (per-element VPU
work). TPU only.
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import build_device, _slope_time  # noqa: E402
from attosecondraytracing_tpu.ops import pallas_trace as pt  # noqa: E402

N = 10_000_000


def main():
    if jax.default_backend() == "cpu":
        raise SystemExit("TPU required")
    source, elements = build_device(N)
    tile = pt.BLOCK_ROWS * pt.LANES
    n_pad = ((N + tile - 1) // tile) * tile

    def prep(x, fill=0.0):
        x = jnp.asarray(x)
        x = jnp.pad(x, (0, n_pad - N), constant_values=fill)
        return x.reshape(n_pad // pt.LANES, pt.LANES)

    comps = tuple(jax.block_until_ready((
        prep(source.p[..., 0]), prep(source.p[..., 1]), prep(source.p[..., 2]),
        prep(source.d[..., 0]), prep(source.d[..., 1]), prep(source.d[..., 2], 1.0),
    )))

    def make_step(els):
        b, m, f, pre = pt._static_chain(els)

        @partial(jax.jit, static_argnames=("reps",))
        def step(comps, reps: int):
            acc = jnp.asarray(0.0, jnp.float32)
            for i in range(reps):
                c = (comps[0] + (i + 1) * 1e-30,) + comps[1:]
                outs = pt._pallas_trace_padded(c, b, m, f, pre, pt.BLOCK_ROWS, False,
                                               fresh=True, n_rays=N)
                for o in outs:
                    acc = acc + o.astype(jnp.float32).sum()
            return acc
        return step

    subsets = {
        "full(mask+2tor)": elements,
        "mask only": elements[:1],
        "1 toroid": elements[1:2],
        "2 toroids": elements[1:],
    }
    times = {}
    for name, els in subsets.items():
        dt = _slope_time(make_step(els), comps, rounds=6, verbose=False, label=name)
        times[name] = dt
        print(f"{name:18s}: {dt*1e3:7.3f} ms/trace  ({N/dt/1e9:.2f} Gray/s)")

    # memory floor: same streams, no compute (copy px..dz, zeros for the rest)
    def copy_kernel(px, py, pz, dx, dy, dz, *outs):
        (opx, opy, opz, odx, ody, odz, oopl, oopl_c, oalive, oinc) = outs
        opx[:] = px[:]; opy[:] = py[:]; opz[:] = pz[:]
        odx[:] = dx[:]; ody[:] = dy[:]; odz[:] = dz[:]
        z = jnp.zeros_like(px[:])
        oopl[:] = z; oopl_c[:] = z; oinc[:] = z
        oalive[:] = jnp.zeros_like(px[:], dtype=jnp.int8) + 1

    rows = comps[0].shape[0]
    fspec = jax.experimental.pallas.BlockSpec(
        (pt.BLOCK_ROWS, pt.LANES), lambda i: (i, 0))

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    fspec = pl.BlockSpec((pt.BLOCK_ROWS, pt.LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    @partial(jax.jit, static_argnames=("reps",))
    def step_copy(comps, reps: int):
        acc = jnp.asarray(0.0, jnp.float32)
        out_shape = tuple([jax.ShapeDtypeStruct((rows, pt.LANES), jnp.float32)] * 8
                          + [jax.ShapeDtypeStruct((rows, pt.LANES), jnp.int8),
                             jax.ShapeDtypeStruct((rows, pt.LANES), jnp.float32)])
        for i in range(reps):
            c = (comps[0] + (i + 1) * 1e-30,) + comps[1:]
            outs = pl.pallas_call(
                copy_kernel, grid=(rows // pt.BLOCK_ROWS,),
                in_specs=[fspec] * 6, out_specs=tuple([fspec] * 10),
                out_shape=out_shape)(*c)
            for o in outs:
                acc = acc + o.astype(jnp.float32).sum()
        return acc

    dt = _slope_time(step_copy, comps, rounds=6, verbose=False, label="copy")
    times["copy floor"] = dt
    bytes_per_ray = 6 * 4 + 8 * 4 + 1 + 4
    print(f"{'copy floor':18s}: {dt*1e3:7.3f} ms/trace  "
          f"({N/dt/1e9:.2f} Gray/s, {bytes_per_ray*N/dt/1e9:.0f} GB/s)")
    t_full = times["full(mask+2tor)"]
    print(f"\ncompute share of full trace: {(t_full-dt)/t_full*100:.0f}%")
    print(f"mask cost    ~ {(times['mask only']-dt)*1e3:6.3f} ms")
    print(f"toroid cost  ~ {(times['1 toroid']-dt)*1e3:6.3f} ms")
    print(f"2nd toroid   ~ {(times['2 toroids']-times['1 toroid'])*1e3:6.3f} ms")


if __name__ == "__main__":
    main()
