"""Differentiability: gradients of detector metrics w.r.t. alignment and
surface parameters (checked against finite differences), and gradient-descent
re-alignment of a misaligned chain."""

import jax
import jax.numpy as jnp
import numpy as np

from attosecondraytracing_tpu.analysis import alignment as al
from attosecondraytracing_tpu.models import mirrors as mmirror
from attosecondraytracing_tpu.models import supports as msupp
from attosecondraytracing_tpu.models.detector import Detector
from attosecondraytracing_tpu.models.placement import OEPlacement


def _chain_and_detector(misalign_roll_deg=0.0, n_rays=400):
    parabola = mmirror.MirrorParabolic(100, 90, msupp.SupportRound(12))
    props = {"Divergence": 0, "SourceSize": 20, "Wavelength": 50e-6, "DeltaFT": 1, "NumberRays": n_rays}
    chain = OEPlacement(props, [parabola], [200], [0.0])
    det = Detector(chain.optical_elements[0].position)
    det.autoplace(chain.trace_final(), 100.0)
    if misalign_roll_deg:
        chain.optical_elements[0].rotate_roll_by(misalign_roll_deg)
    return chain, det


def _loss_fn(chain, det):
    elements = chain.device_elements()
    source = chain.source_rays
    centre = jnp.asarray(det.centre)
    normal = jnp.asarray(det.normal)
    rot = jnp.asarray(det._plane_rotation())

    def loss(params):
        return al.focus_loss(params, source, elements, centre, normal, rot)

    return loss


def test_alignment_gradient_matches_finite_difference():
    chain, det = _chain_and_detector(misalign_roll_deg=0.05)
    loss = _loss_fn(chain, det)
    params = al.zero_params(1, dtype=jnp.float64)
    g = jax.grad(loss)(params)
    # finite differences on each angle component
    eps = 1e-7
    for j in range(3):
        delta = np.zeros((1, 3))
        delta[0, j] = eps
        lp = float(loss(params._replace(angles=params.angles + delta)))
        lm = float(loss(params._replace(angles=params.angles - delta)))
        fd = (lp - lm) / (2 * eps)
        an = float(np.asarray(g.angles)[0, j])
        np.testing.assert_allclose(an, fd, rtol=5e-3, atol=1e-10)
    for j in range(3):
        delta = np.zeros((1, 3))
        delta[0, j] = eps
        lp = float(loss(params._replace(shifts=params.shifts + delta)))
        lm = float(loss(params._replace(shifts=params.shifts - delta)))
        fd = (lp - lm) / (2 * eps)
        an = float(np.asarray(g.shifts)[0, j])
        np.testing.assert_allclose(an, fd, rtol=5e-3, atol=1e-10)


def test_gradient_descent_realigns_rolled_parabola():
    """Start from a rolled OAP (blurred focus); gradient descent on the pose
    recovers a tighter focus (the BASELINE 'alignment-gradient descent'
    scenario)."""
    chain, det = _chain_and_detector(misalign_roll_deg=0.1)
    loss = _loss_fn(chain, det)
    params = al.zero_params(1, dtype=jnp.float64)
    l0 = float(loss(params))
    params, history = al.gradient_align(chain, det, iters=60, lr=2e-3)
    l1 = history[-1]
    assert l1 < 0.05 * l0, f"loss only went {l0} -> {l1}"


def test_grad_wrt_surface_parameters():
    """Gradients flow into surface shape parameters (e.g. toroid radii) —
    enabling design optimization, not just alignment."""
    from attosecondraytracing_tpu.ops.trace import trace
    from attosecondraytracing_tpu.analysis import stats

    focal, inc = 500.0, 80.0
    R0, r0 = mmirror.ReturnOptimalToroidalRadii(focal, inc)
    mirror = mmirror.MirrorToroidal(R0, r0, msupp.SupportRectangle(300, 50))
    props = {"Divergence": 10e-3, "SourceSize": 0, "Wavelength": 50e-6, "DeltaFT": 1, "NumberRays": 300}
    chain = OEPlacement(props, [mirror], [2 * focal], [inc])
    det = Detector(chain.optical_elements[0].position)
    det.autoplace(chain.trace_final(), 2 * focal)
    elements = chain.device_elements()
    source = chain.source_rays
    centre = jnp.asarray(det.centre)
    normal = jnp.asarray(det.normal)
    rot = jnp.asarray(det._plane_rotation())

    def loss(radii):
        el = elements[0]
        el = el._replace(surface=el.surface._replace(major_radius=radii[0], minor_radius=radii[1]))
        out = trace(source, [el], keep_history=False)
        w = out.alive.astype(out.p.dtype)
        xy = stats.detector_points_2d(out, centre, normal, rot)
        return stats.std_points(xy, w) ** 2

    radii = jnp.array([R0, r0])
    g = jax.grad(loss)(radii)
    assert np.all(np.isfinite(np.asarray(g)))
    # finite-difference check on the major radius
    eps = 1e-4
    fd = (float(loss(radii + jnp.array([eps, 0.0]))) - float(loss(radii - jnp.array([eps, 0.0])))) / (2 * eps)
    np.testing.assert_allclose(float(g[0]), fd, rtol=1e-3)


def test_fused_pallas_grads_match_xla_grads():
    """The forward-mode Pallas gradient engine (ops/pallas_grad.py) must
    reproduce reverse-mode XLA gradients of the focus loss on the flagship
    chain (VERDICT r2 #2). Both paths are evaluated on the *same* source
    (the kernel's own float32 spiral + closed-form Gaussian weights) so the
    only differences are f32 reassociation and JVP-vs-VJP rounding."""
    import pytest
    import jax
    import jax.numpy as jnp

    from attosecondraytracing_tpu.analysis import alignment as al
    from attosecondraytracing_tpu.analysis import stats
    from attosecondraytracing_tpu.models import masks as mmask
    from attosecondraytracing_tpu.models import mirrors as mmirror
    from attosecondraytracing_tpu.models import supports as msupp
    from attosecondraytracing_tpu.models.detector import Detector
    from attosecondraytracing_tpu.models.placement import OEPlacement
    from attosecondraytracing_tpu.ops import pallas_grad as pg
    from attosecondraytracing_tpu.ops import pallas_trace as pt
    from attosecondraytracing_tpu.ops.trace import trace

    focal, inc = 500.0, 80.0
    R, r = mmirror.ReturnOptimalToroidalRadii(focal, inc)
    tor = mmirror.MirrorToroidal(R, r, msupp.SupportRectangle(150, 32))
    mask = mmask.Mask(msupp.SupportRoundHole(20, 7, 0, 0))
    props = {"Divergence": 25e-3, "SourceSize": 0, "Wavelength": 80e-6,
             "DeltaFT": 0.5, "NumberRays": 8192}
    chain = OEPlacement(props, [mask, tor, tor], [400, 100, 500],
                        [0, inc, -inc], [0, 0, 0])
    elements = [e.to_device(dtype=jnp.float32) for e in chain.optical_elements]
    n = 8192
    edge = float(np.exp(-2.0))

    src_info = chain.source_spec
    assert src_info is not None
    baked_src = src_info.baked()

    det = Detector(chain.optical_elements[-1].position)
    probe = pt.source_bundle(baked_src, 256, wavelength=80e-6)
    det.autoplace(trace(probe, elements, keep_history=False), focal - 5.0)
    det_rot = det._plane_rotation()

    spec = pg.make_loss_spec(
        src_info._replace(gaussian_edge=edge, n_rays=n), elements,
        det.centre, det.normal, duration_weight=0.0, survival_weight=1.0,
    )

    # start slightly misaligned so gradients are nonzero
    params = al.zero_params(len(elements), dtype=jnp.float32)
    params = params._replace(
        angles=params.angles.at[1, 0].set(2e-4).at[2, 2].set(-1e-4),
        shifts=params.shifts.at[1, 0].set(0.05),
    )

    loss_pl, grads_pl = pg.fused_focus_value_and_grad(
        params, spec, elements, np.asarray(baked_src.rot),
        np.asarray(src_info.origin), det.centre, det.normal, det_rot,
    )

    # XLA reference: identical physics — kernel-form source + rr-law weights
    src = pt.source_bundle(baked_src, n, wavelength=80e-6)
    kf = jnp.arange(n, dtype=jnp.float32)
    weights = jnp.exp(np.log(edge) * kf / n)
    src = src._replace(intensity=weights)

    def xla_loss(p):
        return al.focus_loss(
            p, src, elements, jnp.asarray(det.centre, jnp.float32),
            jnp.asarray(det.normal, jnp.float32), jnp.asarray(det_rot, jnp.float32),
            duration_weight=0.0, survival_weight=1.0,
        )

    loss_x, grads_x = jax.value_and_grad(xla_loss)(params)

    assert float(loss_pl) == pytest.approx(float(loss_x), rel=2e-3)
    for g_pl, g_x in [(grads_pl.angles, grads_x.angles), (grads_pl.shifts, grads_x.shifts)]:
        g_pl, g_x = np.asarray(g_pl), np.asarray(g_x)
        scale = max(np.abs(g_x).max(), 1e-12)
        np.testing.assert_allclose(g_pl, g_x, atol=2e-2 * scale, rtol=2e-2)


def test_gradient_align_fused_descends():
    """gradient_align(engine='pallas') must descend the loss on a misaligned
    flagship chain through the fused engine (interpret mode on CPU)."""
    import jax.numpy as jnp

    from attosecondraytracing_tpu.analysis import alignment as al
    from attosecondraytracing_tpu.models import mirrors as mmirror
    from attosecondraytracing_tpu.models import supports as msupp
    from attosecondraytracing_tpu.models.detector import Detector
    from attosecondraytracing_tpu.models.placement import OEPlacement

    focal, inc = 500.0, 80.0
    R, r = mmirror.ReturnOptimalToroidalRadii(focal, inc)
    tor = mmirror.MirrorToroidal(R, r, msupp.SupportRectangle(150, 32))
    props = {"Divergence": 25e-3, "SourceSize": 0, "Wavelength": 80e-6,
             "DeltaFT": 0.5, "NumberRays": 2048}
    chain = OEPlacement(props, [tor, tor], [500, 600], [inc, -inc], [0, 0])
    chain.rotate_OE(0, "roll", 0.3)  # misalign

    det = Detector(chain.optical_elements[-1].position)
    det.autoplace(chain.trace_final(engine="xla"), focal)
    params, history = al.gradient_align(
        chain, det, iters=12, lr=2e-4, engine="pallas", survival_weight=0.1,
    )
    assert history[-1] < 0.9 * history[0], history


def _grad_setup(n=8192):
    import jax.numpy as jnp

    from attosecondraytracing_tpu.analysis import alignment as al
    from attosecondraytracing_tpu.models import masks as mmask
    from attosecondraytracing_tpu.models import mirrors as mmirror
    from attosecondraytracing_tpu.models import supports as msupp
    from attosecondraytracing_tpu.models.detector import Detector
    from attosecondraytracing_tpu.models.placement import OEPlacement
    from attosecondraytracing_tpu.ops import pallas_grad as pg
    from attosecondraytracing_tpu.ops import pallas_trace as pt
    from attosecondraytracing_tpu.ops.trace import trace_jit

    focal, inc = 500.0, 80.0
    R, r = mmirror.ReturnOptimalToroidalRadii(focal, inc)
    tor = mmirror.MirrorToroidal(R, r, msupp.SupportRectangle(150, 32))
    mask = mmask.Mask(msupp.SupportRoundHole(20, 7, 0, 0))
    props = {"Divergence": 25e-3, "SourceSize": 0, "Wavelength": 80e-6,
             "DeltaFT": 0.5, "NumberRays": n}
    chain = OEPlacement(props, [mask, tor, tor], [400, 100, 500],
                        [0, inc, -inc], [0, 0, 0])
    elements = [e.to_device(dtype=jnp.float32) for e in chain.optical_elements]
    src_info = chain.source_spec
    baked_src = src_info.baked()
    det = Detector(chain.optical_elements[-1].position)
    probe = pt.source_bundle(baked_src, 256, wavelength=80e-6)
    det.autoplace(trace_jit(probe, elements, keep_history=False), focal - 5.0)
    spec = pg.make_loss_spec(
        src_info._replace(gaussian_edge=float(np.exp(-2.0)), n_rays=n),
        elements, det.centre, det.normal,
        duration_weight=0.0, survival_weight=1.0)
    params = al.zero_params(len(elements), dtype=jnp.float32)
    params = params._replace(
        angles=params.angles.at[1, 0].set(2e-4).at[2, 2].set(-1e-4),
        shifts=params.shifts.at[1, 0].set(0.05))
    args = (params, spec, elements, np.asarray(baked_src.rot),
            np.asarray(src_info.origin), det.centre, det.normal,
            det._plane_rotation())
    return args


def test_fused_grad_chunked_matches_single_pass():
    """Chunking the ray range via the (phase, k_frac) spiral law (the giga-ray
    path, VERDICT r3 #2) reproduces the single-pass gradient: the chunks
    cover the SAME global spiral, so only f32 summation order differs."""
    import jax

    from attosecondraytracing_tpu.ops import pallas_grad as pg

    args = _grad_setup(8192)
    loss_1, grads_1 = pg.fused_focus_value_and_grad(*args)
    loss_c, grads_c = pg.fused_focus_value_and_grad(*args, chunk_size=2048)
    np.testing.assert_allclose(float(loss_c), float(loss_1), rtol=1e-4)
    for g_c, g_1 in zip(jax.tree.leaves(grads_c), jax.tree.leaves(grads_1)):
        g_c, g_1 = np.asarray(g_c), np.asarray(g_1)
        scale = max(np.abs(g_1).max(), 1e-12)
        np.testing.assert_allclose(g_c, g_1, atol=2e-3 * scale, rtol=2e-3)


def test_fused_grad_sharded_matches_single_device():
    """shard_map'd fused gradient over the 8-virtual-device mesh == the
    single-device gradient (per-device spiral shards, partial-sum vectors
    combined across the mesh)."""
    import jax

    from attosecondraytracing_tpu.ops import pallas_grad as pg

    args = _grad_setup(8192)
    loss_1, grads_1 = pg.fused_focus_value_and_grad(*args)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("rays",))
    loss_s, grads_s = pg.fused_focus_value_and_grad(*args, mesh=mesh)
    np.testing.assert_allclose(float(loss_s), float(loss_1), rtol=1e-4)
    for g_s, g_1 in zip(jax.tree.leaves(grads_s), jax.tree.leaves(grads_1)):
        g_s, g_1 = np.asarray(g_s), np.asarray(g_1)
        scale = max(np.abs(g_1).max(), 1e-12)
        np.testing.assert_allclose(g_s, g_1, atol=2e-3 * scale, rtol=2e-3)
