"""Jittable Zernike circle polynomials and Cartesian gradients.

Vectorized implementation of the recurrence of T. B. Andersen, "Efficient and
robust recurrence relations for the Zernike circle polynomials and their
derivatives in Cartesian coordinates," Opt. Express 26, 18878 (2018) — the
same algorithm (and the same (n, m) indexing with m = 0..n, azimuthal
frequency 2m-n) as the reference's per-point pure-Python version
(ART/recursive_zernike_generator.py:4-253), so user coefficient dictionaries
behave identically. Here the recurrence runs over whole arrays and is
differentiable and jit-compatible (max_order is static).
"""

from __future__ import annotations

import jax.numpy as jnp


def zernike_value_and_grad(x, y, max_order: int):
    """Evaluate all Zernike polynomials and their x/y gradients up to
    ``max_order`` at array coordinates (x, y) on the unit disk.

    Returns three dicts keyed by (n, m), m = 0..n: values, d/dx, d/dy —
    each an array shaped like ``x``.
    """
    max_order = max(int(max_order), 2)
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)

    Z = {(0, 0): one, (1, 0): y, (1, 1): x}
    DX = {(0, 0): zero, (1, 0): zero, (1, 1): one}
    DY = {(0, 0): zero, (1, 0): one, (1, 1): zero}

    for n in range(2, max_order + 1):
        for m in range(0, n + 1):
            if m == 0:
                Z[(n, 0)] = x * Z[(n - 1, 0)] + y * Z[(n - 1, n - 1)]
                DX[(n, 0)] = n * Z[(n - 1, 0)]
                DY[(n, 0)] = n * Z[(n - 1, n - 1)]
            elif m == n:
                Z[(n, n)] = x * Z[(n - 1, n - 1)] - y * Z[(n - 1, 0)]
                DX[(n, n)] = n * Z[(n - 1, n - 1)]
                DY[(n, n)] = -n * Z[(n - 1, 0)]
            elif n % 2 != 0 and m == (n - 1) // 2:
                Z[(n, m)] = (
                    y * Z[(n - 1, n - 1 - m)]
                    + x * Z[(n - 1, m - 1)]
                    - y * Z[(n - 1, n - m)]
                    - Z[(n - 2, m - 1)]
                )
                DX[(n, m)] = n * Z[(n - 1, m - 1)] + DX[(n - 2, m - 1)]
                DY[(n, m)] = n * Z[(n - 1, n - 1 - m)] - n * Z[(n - 1, n - m)] + DY[(n - 2, m - 1)]
            elif n % 2 != 0 and m == (n - 1) // 2 + 1:
                Z[(n, m)] = (
                    x * Z[(n - 1, m)]
                    + y * Z[(n - 1, n - 1 - m)]
                    + x * Z[(n - 1, m - 1)]
                    - Z[(n - 2, m - 1)]
                )
                DX[(n, m)] = n * Z[(n - 1, m)] + n * Z[(n - 1, m - 1)] + DX[(n - 2, m - 1)]
                DY[(n, m)] = n * Z[(n - 1, n - 1 - m)] + DY[(n - 2, m - 1)]
            elif n % 2 == 0 and m == n // 2:
                Z[(n, m)] = 2.0 * x * Z[(n - 1, m)] + 2.0 * y * Z[(n - 1, m - 1)] - Z[(n - 2, m - 1)]
                DX[(n, m)] = 2.0 * n * Z[(n - 1, m)] + DX[(n - 2, m - 1)]
                DY[(n, m)] = 2.0 * n * Z[(n - 1, n - 1 - m)] + DY[(n - 2, m - 1)]
            else:
                Z[(n, m)] = (
                    x * Z[(n - 1, m)]
                    + y * Z[(n - 1, n - 1 - m)]
                    + x * Z[(n - 1, m - 1)]
                    - y * Z[(n - 1, n - m)]
                    - Z[(n - 2, m - 1)]
                )
                DX[(n, m)] = n * Z[(n - 1, m)] + n * Z[(n - 1, m - 1)] + DX[(n - 2, m - 1)]
                DY[(n, m)] = n * Z[(n - 1, n - 1 - m)] - n * Z[(n - 1, n - m)] + DY[(n - 2, m - 1)]

    return Z, DX, DY
