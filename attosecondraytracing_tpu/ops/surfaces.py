"""Mirror surfaces as implicit functions with batched, differentiable,
Newton-polished intersections (JAX).

TPU-native replacement for ART/ModuleMirror.py's per-ray ``np.roots`` calls
(ART/ModuleGeometry.py:80-106): every surface provides

* a closed-form (quadratic, or Ferrari-quartic for the toroid) seed for the
  ray parameter ``t``,
* a few Newton iterations on a *well-conditioned, distance-like* residual
  ``g(t)`` (values ~mm near the surface, no 1e12-scale cancellations), which
  restores near machine precision even in float32,
* branch filters and vectorized support clipping identical in semantics to the
  reference (candidate roots are filtered by t>0, the surface branch
  constraint, and support inclusion; the nearest valid hit wins —
  ART/ModuleMirror.py:27-38 and the per-surface ``_get_intersection``).

All functions are batched over rays and fully differentiable, so detector
metrics are differentiable w.r.t. surface parameters.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import supports as sup
from .precision import T_EPS

#: a candidate root counts as a real hit if the polished point lies within
#: this distance [mm] of the surface (also rejects Newton non-convergence).
HIT_TOL = 1e-3

_NEWTON_ITERS = 3
_NEWTON_ITERS_TOROID = 6


class Plane(NamedTuple):
    """z = 0 plane (mirror: ART/ModuleMirror.py:42-113; also masks)."""


class Sphere(NamedTuple):
    """Full sphere x^2+y^2+z^2 = R^2, mirror patch on the z<0 branch
    (ART/ModuleMirror.py:117-208). ``radius`` is stored positive; convex
    mirrors are realized by flipping the incidence at placement, exactly like
    the reference (ART/ModuleProcessing.py:93-95)."""

    radius: jnp.ndarray


class Parabola(NamedTuple):
    """Paraboloid z = (x^2+y^2)/(2p) with vertex at the origin
    (ART/ModuleMirror.py:212-387). ``center_x`` = f_eff*sin(alpha) is the
    off-axis distance of the support centre (used for support clipping)."""

    p: jnp.ndarray
    center_x: jnp.ndarray


class Toroid(NamedTuple):
    """Torus (sqrt(x^2+z^2)-R)^2 + y^2 = r^2, mirror patch on the outer
    z < -R branch (ART/ModuleMirror.py:391-527)."""

    major_radius: jnp.ndarray
    minor_radius: jnp.ndarray


class Ellipsoid(NamedTuple):
    """Ellipsoid (x/a)^2 + (y^2+z^2)/b^2 = 1, patch on z<0
    (ART/ModuleMirror.py:565-751). ``center_x``/``center_z`` locate the
    support centre on the surface (reference get_centre,
    ART/ModuleMirror.py:695-714)."""

    a: jnp.ndarray
    b: jnp.ndarray
    center_x: jnp.ndarray
    center_z: jnp.ndarray


class Cylinder(NamedTuple):
    """Cylinder y^2 + z^2 = R^2 (axis along x), patch on z<0
    (ART/ModuleMirror.py:781-874)."""

    radius: jnp.ndarray


# ---------------------------------------------------------------------------
# residuals g(t): distance-like implicit functions, conditioned for float32
# ---------------------------------------------------------------------------


def _residual_sphere(surface, q, u):
    r = jnp.linalg.norm(q, axis=-1)
    g = r - surface.radius
    gp = jnp.sum(q * u, axis=-1) / jnp.maximum(r, 1e-30)
    return g, gp


def _residual_cylinder(surface, q, u):
    r = jnp.hypot(q[..., 1], q[..., 2])
    g = r - surface.radius
    gp = (q[..., 1] * u[..., 1] + q[..., 2] * u[..., 2]) / jnp.maximum(r, 1e-30)
    return g, gp


def _residual_parabola(surface, q, u):
    x, y, z = q[..., 0], q[..., 1], q[..., 2]
    p = surface.p
    h = z - (x * x + y * y) / (2.0 * p)
    hp = u[..., 2] - (x * u[..., 0] + y * u[..., 1]) / p
    # scale to a distance: |grad h| = sqrt(x^2+y^2+p^2)/p
    scale = p / jnp.sqrt(x * x + y * y + p * p)
    return h * scale, hp * scale


def _residual_ellipsoid(surface, q, u):
    a2 = surface.a * surface.a
    b2 = surface.b * surface.b
    x, y, z = q[..., 0], q[..., 1], q[..., 2]
    f = x * x / a2 + (y * y + z * z) / b2 - 1.0
    fp = 2.0 * (x * u[..., 0] / a2 + (y * u[..., 1] + z * u[..., 2]) / b2)
    grad = 2.0 * jnp.sqrt((x / a2) ** 2 + (y / b2) ** 2 + (z / b2) ** 2)
    scale = 1.0 / jnp.maximum(grad, 1e-30)
    return f * scale, fp * scale


def _residual_toroid(surface, q, u):
    R, r = surface.major_radius, surface.minor_radius
    x, y, z = q[..., 0], q[..., 1], q[..., 2]
    rho = jnp.hypot(x, z)
    w = rho - R
    s = jnp.hypot(w, y)
    g = s - r
    drho_dt = (x * u[..., 0] + z * u[..., 2]) / jnp.maximum(rho, 1e-30)
    gp = (w * drho_dt + y * u[..., 1]) / jnp.maximum(s, 1e-30)
    return g, gp


_RESIDUALS = {
    Sphere: _residual_sphere,
    Cylinder: _residual_cylinder,
    Parabola: _residual_parabola,
    Ellipsoid: _residual_ellipsoid,
    Toroid: _residual_toroid,
}


def _newton_polish(surface, p, d, t, iters):
    """Newton-polish candidate roots ``t`` (any batch shape); returns
    (t, |g(t)|)."""
    res = _RESIDUALS[type(surface)]
    for _ in range(iters):
        q = p + t[..., None] * d
        g, gp = res(surface, q, d)
        # guard: keep t fixed where derivative vanishes (grazing turning point)
        step = g / jnp.where(jnp.abs(gp) > 1e-12, gp, jnp.inf)
        t = t - step
    q = p + t[..., None] * d
    g, _ = res(surface, q, d)
    return t, jnp.abs(g)


# ---------------------------------------------------------------------------
# closed-form seeds
# ---------------------------------------------------------------------------


def _solve_quadratic(a, b, c):
    """Stable quadratic roots (citardauq form); invalid roots -> nan."""
    disc = b * b - 4.0 * a * c
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    qq = -0.5 * (b + jnp.sign(b) * sq)
    # sign(0) = 0 -> qq = -b/2; fine since then disc = -4ac and roots are +-sq/2a
    qq = jnp.where(b == 0.0, -0.5 * sq, qq)
    tiny = 1e-30
    linear = jnp.abs(a) < tiny
    t1 = jnp.where(linear, -c / jnp.where(jnp.abs(b) > tiny, b, jnp.inf), qq / jnp.where(jnp.abs(a) > tiny, a, jnp.inf))
    t2 = jnp.where(linear, jnp.inf, c / jnp.where(jnp.abs(qq) > tiny, qq, jnp.inf))
    nan = jnp.full_like(t1, jnp.nan)
    return jnp.where(ok, t1, nan), jnp.where(ok, t2, nan)


def _quadratic_coeffs(surface, p, d):
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    ux, uy, uz = d[..., 0], d[..., 1], d[..., 2]
    if isinstance(surface, Sphere):
        a = jnp.ones_like(x)
        b = 2.0 * jnp.sum(d * p, axis=-1)
        c = jnp.sum(p * p, axis=-1) - surface.radius**2
    elif isinstance(surface, Cylinder):
        a = uy * uy + uz * uz
        b = 2.0 * (uy * y + uz * z)
        c = y * y + z * z - surface.radius**2
    elif isinstance(surface, Parabola):
        pp = surface.p
        a = ux * ux + uy * uy
        b = 2.0 * (ux * x + uy * y) - 2.0 * pp * uz
        c = x * x + y * y - 2.0 * pp * z
    elif isinstance(surface, Ellipsoid):
        a2, b2 = surface.a**2, surface.b**2
        a = (uy * uy + uz * uz) / b2 + ux * ux / a2
        b = 2.0 * ((uy * y + uz * z) / b2 + ux * x / a2)
        c = (y * y + z * z) / b2 + x * x / a2 - 1.0
    else:
        raise TypeError(f"not a quadratic surface: {type(surface)}")
    return a, b, c


def _cbrt(x):
    return jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)


def _largest_real_cubic_root(a2, a1, a0):
    """Largest real root of y^3 + a2 y^2 + a1 y + a0 = 0, vectorized and
    branchless (trigonometric / Cardano forms selected by jnp.where)."""
    p = a1 - a2 * a2 / 3.0
    q = 2.0 * a2**3 / 27.0 - a2 * a1 / 3.0 + a0
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3
    # three-real-root case (disc <= 0): trigonometric solution
    mp3 = jnp.sqrt(jnp.maximum(-p / 3.0, 1e-300))
    cos_arg = jnp.clip(3.0 * q / (2.0 * p * mp3), -1.0, 1.0)
    # note: 3q/(2p) * 1/mp3 with p<0; guard p ~ 0
    cos_arg = jnp.where(jnp.abs(p) > 1e-30, cos_arg, 0.0)
    theta = jnp.arccos(cos_arg) / 3.0
    y_tri = 2.0 * mp3 * jnp.cos(theta)  # largest of the three roots
    # one-real-root case (disc > 0): Cardano
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u_c = _cbrt(-q / 2.0 + sq)
    v_c = _cbrt(-q / 2.0 - sq)
    y_car = u_c + v_c
    w = jnp.where(disc > 0.0, y_car, y_tri)
    return w - a2 / 3.0


def _quartic_roots(b, c, d, e):
    """Real roots of t^4 + b t^3 + c t^2 + d t + e (Ferrari); complex-pair
    slots are filled with nan. Returns (..., 4)."""
    # depressed quartic s^4 + P s^2 + Q s + R0, t = s - b/4
    b2 = b * b
    P = c - 3.0 * b2 / 8.0
    Q = d - b * c / 2.0 + b * b2 / 8.0
    R0 = e - b * d / 4.0 + b2 * c / 16.0 - 3.0 * b2 * b2 / 256.0
    # resolvent cubic y^3 + 2P y^2 + (P^2-4R0) y - Q^2 = 0 (root y0 >= 0)
    y0 = _largest_real_cubic_root(2.0 * P, P * P - 4.0 * R0, -Q * Q)
    y0 = jnp.maximum(y0, 0.0)
    u = jnp.sqrt(y0)
    safe_u = jnp.abs(u) > 1e-12
    qu = jnp.where(safe_u, Q / jnp.where(safe_u, 2.0 * u, 1.0), 0.0)
    A = (P + y0) / 2.0 - qu
    B = (P + y0) / 2.0 + qu
    # biquadratic fallback when Q ~ 0 (u ~ 0): s^2 = (-P +- sqrt(P^2-4R0))/2
    db = jnp.maximum(P * P - 4.0 * R0, 0.0)
    A_bq = (P + jnp.sqrt(db)) / 2.0
    B_bq = (P - jnp.sqrt(db)) / 2.0
    A = jnp.where(safe_u, A, A_bq)
    B = jnp.where(safe_u, B, B_bq)
    # factors: (s^2 + u s + A)(s^2 - u s + B)
    s1a, s1b = _solve_quadratic(jnp.ones_like(u), u, A)
    s2a, s2b = _solve_quadratic(jnp.ones_like(u), -u, B)
    roots = jnp.stack([s1a, s1b, s2a, s2b], axis=-1)
    return roots - (b / 4.0)[..., None]


def _toroid_seeds(surface, p, d):
    """Candidate t seeds for the toroid: 4 Ferrari roots of the exact quartic
    (coefficients as in ART/ModuleMirror.py:443-466) + the 2 roots of the
    osculating sphere of radius R+r (robust float32 fallback near the mirror
    patch at (0,0,-R-r))."""
    R, r = surface.major_radius, surface.minor_radius
    x, z = p[..., 0], p[..., 2]
    ux, uz = d[..., 0], d[..., 2]
    K = 2.0 * jnp.sum(d * p, axis=-1)
    L = jnp.sum(p * p, axis=-1) + R * R - r * r
    G = 4.0 * R * R * (ux * ux + uz * uz)
    H = 8.0 * R * R * (ux * x + uz * z)
    II = 4.0 * R * R * (x * x + z * z)
    b = 2.0 * K
    c = K * K + 2.0 * L - G
    dd = 2.0 * K * L - H
    e = L * L - II
    quartic = _quartic_roots(b, c, dd, e)
    # osculating sphere |q| = R + r
    a_s = jnp.ones_like(K)
    b_s = 2.0 * jnp.sum(d * p, axis=-1)
    c_s = jnp.sum(p * p, axis=-1) - (R + r) ** 2
    s1, s2 = _solve_quadratic(a_s, b_s, c_s)
    return jnp.concatenate([quartic, jnp.stack([s1, s2], axis=-1)], axis=-1)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def support_offset_xy(surface):
    """Offset of the support centre in the local x-y plane: support clipping
    tests (x,y) relative to this point (reference tests Intersect minus
    get_centre() for parabola/ellipsoid, Intersect directly otherwise —
    ART/ModuleMirror.py:344, :678-680)."""
    if isinstance(surface, Parabola):
        return surface.center_x, jnp.zeros_like(surface.center_x)
    if isinstance(surface, Ellipsoid):
        return surface.center_x, jnp.zeros_like(surface.center_x)
    zero = jnp.asarray(0.0)
    return zero, zero


def _branch_ok(surface, q):
    """Physical-branch filter for candidate hits (reference's z<0 / z<-R
    conditions in each _get_intersection)."""
    z = q[..., 2]
    if isinstance(surface, (Sphere, Cylinder, Ellipsoid)):
        return z < 0.0
    if isinstance(surface, Toroid):
        return z < -surface.major_radius
    return jnp.ones(q.shape[:-1], dtype=bool)


def intersect(surface, support, p, d, t_eps=T_EPS, tol=HIT_TOL):
    """Nearest valid ray/surface intersection for a batch of rays.

    Parameters: local-frame ray origins ``p`` (N,3) and unit directions ``d``.
    Returns ``(t, hit)`` where ``hit`` is False for rays that miss (wrong
    branch, outside support, behind the ray, or no real root).
    """
    if isinstance(surface, Plane):
        uz = d[..., 2]
        t = -p[..., 2] / jnp.where(jnp.abs(uz) > 1e-30, uz, jnp.inf)
        q = p + t[..., None] * d
        ox, oy = support_offset_xy(surface)
        on_sup = sup.include(support, q[..., 0] - ox, q[..., 1] - oy)
        return t, (t > t_eps) & on_sup

    if isinstance(surface, Toroid):
        cand = _toroid_seeds(surface, p, d)
        iters = _NEWTON_ITERS_TOROID
    else:
        a, b, c = _quadratic_coeffs(surface, p, d)
        t1, t2 = _solve_quadratic(a, b, c)
        cand = jnp.stack([t1, t2], axis=-1)
        iters = _NEWTON_ITERS

    cand = jnp.where(jnp.isfinite(cand), cand, -1.0)
    pc = p[..., None, :]
    dc = d[..., None, :]
    tpol, g_abs = _newton_polish(surface, pc, dc, cand, iters)
    q = pc + tpol[..., None] * dc
    ox, oy = support_offset_xy(surface)
    valid = (
        (tpol > t_eps)
        & (g_abs < tol)
        & _branch_ok(surface, q)
        & sup.include(support, q[..., 0] - ox, q[..., 1] - oy)
    )
    t_masked = jnp.where(valid, tpol, jnp.inf)
    t_best = jnp.min(t_masked, axis=-1)
    hit = jnp.isfinite(t_best)
    return jnp.where(hit, t_best, 0.0), hit


def normal_at(surface, q):
    """Unit surface normal pointing to the +z ('up') side, batched
    (reference get_normal methods return the same orientation)."""
    x, y, z = q[..., 0], q[..., 1], q[..., 2]
    if isinstance(surface, Plane):
        n = jnp.zeros_like(q).at[..., 2].set(1.0)
        return n
    if isinstance(surface, Sphere):
        n = -q
    elif isinstance(surface, Cylinder):
        n = jnp.stack([jnp.zeros_like(x), -y, -z], axis=-1)
    elif isinstance(surface, Parabola):
        n = jnp.stack([-x, -y, jnp.broadcast_to(surface.p, x.shape)], axis=-1)
    elif isinstance(surface, Ellipsoid):
        a2, b2 = surface.a**2, surface.b**2
        n = jnp.stack([-x / a2, -y / b2, -z / b2], axis=-1)
    elif isinstance(surface, Toroid):
        # grad of ((rho-R)^2 + y^2 - r^2), rho = sqrt(x^2+z^2); normal = -grad
        R = surface.major_radius
        rho = jnp.hypot(x, z)
        w = (rho - R) / jnp.maximum(rho, 1e-30)
        n = jnp.stack([-w * x, -y, -w * z], axis=-1)
    else:
        raise TypeError(f"unknown surface {type(surface)}")
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def slope_normal_add(n1, n2):
    """Compose two 'up' normals by adding their surface slopes
    (vectorized ART/ModuleGeometry.py:394-407). Returns an unnormalized
    [-sum gx, -sum gy, 1] normal."""
    g1x = -n1[..., 0] / n1[..., 2]
    g1y = -n1[..., 1] / n1[..., 2]
    g2x = -n2[..., 0] / n2[..., 2]
    g2y = -n2[..., 1] / n2[..., 2]
    return jnp.stack([-(g1x + g2x), -(g1y + g2y), jnp.ones_like(g1x)], axis=-1)
