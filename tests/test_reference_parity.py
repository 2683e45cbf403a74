"""End-to-end parity against the actual reference implementation.

Runs the reference's own NumPy/quaternion tracer (loaded from /root/reference
via tests/reference_shims.py) and compares, ray by ray:

* auto-placement poses (OEPlacement),
* intersection points / directions / optical path lengths / incidence angles
  after full chains over every surface type (parabola, toroid at grazing
  incidence, sphere, cylinder, ellipsoid, plane + mask),
* detector impact points, femtosecond delays, spot/duration SDs,
* analytic alignment gradients vs central finite differences evaluated with
  the reference code (BASELINE.md correctness target).

All comparisons run in float64 (conftest enables x64 on CPU).
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attosecondraytracing_tpu.analysis import alignment as al
from attosecondraytracing_tpu.analysis import stats
from attosecondraytracing_tpu.models import masks as tmask
from attosecondraytracing_tpu.models import mirrors as tmirror
from attosecondraytracing_tpu.models import supports as tsupp
from attosecondraytracing_tpu.models.detector import Detector
from attosecondraytracing_tpu.models.placement import OEPlacement
from attosecondraytracing_tpu.ops.bundle import make_bundle

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).parent))
from reference_shims import load_reference, raylist_to_arrays  # noqa: E402

ref = load_reference()


def _ref_source_to_bundle(raylist, wavelength=50e-6):
    """Seed our tracer with the reference's exact source rays (ordered by
    ray number so bundle index == Ray.number)."""
    raylist = sorted(raylist, key=lambda r: r.number)
    numbers, points, vectors, _opl, intensity, _inc = raylist_to_arrays(raylist)
    assert np.array_equal(numbers, np.arange(len(raylist)))
    return make_bundle(points, vectors, wavelength=wavelength, intensity=intensity, dtype=np.float64)


def _pose(Position, Normal, MajorAxis):
    """(our element, reference element factory input) for a shared pose."""
    return (
        np.asarray(Position, dtype=float),
        np.asarray(Normal, dtype=float),
        np.asarray(MajorAxis, dtype=float),
    )


def _trace_both(our_optics, ref_optics, poses, raylist, wavelength=50e-6):
    """Trace the same source through manually-posed chains in both frameworks.

    Returns (our final bundle, reference final ray list).
    """
    from attosecondraytracing_tpu.models.chain import OpticalChain as OurChain
    from attosecondraytracing_tpu.models.elements import OpticalElement as OurOE

    our_elements = [OurOE(o, p, n, m) for o, (p, n, m) in zip(our_optics, poses)]
    ref_elements = [
        ref.moe.OpticalElement(o, np.array(p), np.array(n), np.array(m))
        for o, (p, n, m) in zip(ref_optics, poses)
    ]

    bundle = _ref_source_to_bundle(raylist, wavelength)
    our_chain = OurChain(bundle, our_elements, "parity")
    out = our_chain.trace_final()
    ref_out = ref.mp.RayTracingCalculation(copy.deepcopy(raylist), ref_elements)[-1]
    return out, ref_out


def _assert_ray_parity(out, ref_out, atol_p=1e-9, atol_opl=1e-8, atol_inc=1e-10):
    """Survivor sets identical; points/dirs/OPL/incidence allclose per ray."""
    numbers, points, vectors, opl, intensity, incidence = raylist_to_arrays(ref_out)
    alive = np.asarray(out.alive)
    np.testing.assert_array_equal(np.sort(numbers), np.flatnonzero(alive))
    order = np.argsort(numbers)
    idx = numbers[order]
    np.testing.assert_allclose(np.asarray(out.p)[idx], points[order], atol=atol_p)
    np.testing.assert_allclose(np.asarray(out.d)[idx], vectors[order], atol=1e-11)
    np.testing.assert_allclose(np.asarray(out.opl)[idx], opl[order], atol=atol_opl)
    np.testing.assert_allclose(np.asarray(out.incidence)[idx], incidence[order], atol=atol_inc)


# ----------------------------------------------------------------- placement


def test_oeplacement_pose_parity():
    """OEPlacement produces identical element poses (position/normal/majoraxis)
    for a 3-element chain with non-trivial incidence planes
    (ART/ModuleProcessing.py:32-130)."""
    props = {"Divergence": 1e-3, "SourceSize": 0.0, "Wavelength": 50e-6, "DeltaFT": 1.0, "NumberRays": 40}

    t_opt = [
        tmask.Mask(tsupp.SupportRoundHole(Radius=20, RadiusHole=5, CenterHoleX=0, CenterHoleY=0)),
        tmirror.MirrorToroidal(7063.0, 151.7, tsupp.SupportRectangle(150, 30)),
        tmirror.MirrorPlane(tsupp.SupportRound(30)),
    ]
    r_opt = [
        ref.mmask.Mask(ref.msupp.SupportRoundHole(Radius=20, RadiusHole=5, CenterHoleX=0, CenterHoleY=0)),
        ref.mmirror.MirrorToroidal(7063.0, 151.7, ref.msupp.SupportRectangle(150, 30)),
        ref.mmirror.MirrorPlane(ref.msupp.SupportRound(30)),
    ]
    dist, inc, incplane = [300.0, 200.0, 400.0], [0.0, 80.0, 45.0], [0.0, 30.0, -10.0]

    ours = OEPlacement(props, t_opt, dist, inc, incplane)
    refs = ref.mp.OEPlacement(props, r_opt, dist, inc, incplane)
    for oe_t, oe_r in zip(ours.optical_elements, refs.optical_elements):
        np.testing.assert_allclose(oe_t.position, oe_r.position, atol=1e-9)
        np.testing.assert_allclose(oe_t.normal, oe_r.normal, atol=1e-11)
        np.testing.assert_allclose(oe_t.majoraxis, oe_r.majoraxis, atol=1e-11)

    # and the auto-generated source bundles coincide ray-for-ray
    numbers, points, vectors, _, intensity, _ = raylist_to_arrays(
        sorted(refs.source_rays, key=lambda r: r.number)
    )
    np.testing.assert_allclose(np.asarray(ours.source_rays.p)[numbers], points, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ours.source_rays.d)[numbers], vectors, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ours.source_rays.intensity)[numbers], intensity, atol=1e-12)


# -------------------------------------------------------------- full chains


def test_trace_parity_offaxis_parabola():
    """Plane wave -> 90° OAP with holed support (CONFIG_singleparabola's optic)."""
    raylist = ref.msource.PlaneWaveDisk(np.zeros(3), np.array([1.0, 0, 0]), 15.0, 200)
    t = tmirror.MirrorParabolic(150.0, 90.0, tsupp.SupportRoundHole(Radius=25, RadiusHole=4, CenterHoleX=0, CenterHoleY=0))
    r = ref.mmirror.MirrorParabolic(150.0, 90.0, ref.msupp.SupportRoundHole(Radius=25, RadiusHole=4, CenterHoleX=0, CenterHoleY=0))
    pose = _pose([200.0, 0, 0], [-1.0, 0, 1.0], [0.0, 1.0, 0])
    out, ref_out = _trace_both([t], [r], [pose], raylist)
    _assert_ray_parity(out, ref_out)


def test_trace_parity_toroidal_grazing_with_mask():
    """Mask + toroidal mirror at 80° grazing incidence — exercises the quartic
    solver's branch selection (ART/ModuleMirror.py:443-478)."""
    props = {"Divergence": 25e-3, "SourceSize": 0.0, "Wavelength": 50e-6, "DeltaFT": 1.0, "NumberRays": 300}
    R, r_min = tmirror.ReturnOptimalToroidalRadii(500.0, 80.0)
    R_ref, r_ref = ref.mmirror.ReturnOptimalToroidalRadii(500.0, 80.0)
    assert np.isclose(R, R_ref) and np.isclose(r_min, r_ref)

    t_opt = [
        tmask.Mask(tsupp.SupportRoundHole(Radius=20, RadiusHole=6, CenterHoleX=0, CenterHoleY=0)),
        tmirror.MirrorToroidal(R, r_min, tsupp.SupportRectangle(150, 30)),
    ]
    r_opt = [
        ref.mmask.Mask(ref.msupp.SupportRoundHole(Radius=20, RadiusHole=6, CenterHoleX=0, CenterHoleY=0)),
        ref.mmirror.MirrorToroidal(R_ref, r_ref, ref.msupp.SupportRectangle(150, 30)),
    ]
    dist, inc, incplane = [200.0, 300.0], [0.0, 80.0], [0.0, 0.0]
    ours = OEPlacement(props, t_opt, dist, inc, incplane)
    refs = ref.mp.OEPlacement(props, r_opt, dist, inc, incplane)

    ours.source_rays = _ref_source_to_bundle(refs.source_rays)
    out = ours.trace_final()
    ref_out = ref.mp.RayTracingCalculation(copy.deepcopy(refs.source_rays), refs.optical_elements)[-1]
    _assert_ray_parity(out, ref_out, atol_p=1e-7, atol_opl=1e-7)


@pytest.mark.parametrize(
    "kind",
    ["spherical", "cylindrical", "ellipsoidal", "plane"],
)
def test_trace_parity_surfaces(kind):
    """Point source onto each remaining surface type at oblique incidence."""
    raylist = ref.msource.PointSource(np.zeros(3), np.array([1.0, 0, 0]), 8e-3, 150)
    if kind == "spherical":
        t = tmirror.MirrorSpherical(600.0, tsupp.SupportRound(40))
        r = ref.mmirror.MirrorSpherical(600.0, ref.msupp.SupportRound(40))
    elif kind == "cylindrical":
        t = tmirror.MirrorCylindrical(800.0, tsupp.SupportRectangle(60, 40))
        r = ref.mmirror.MirrorCylindrical(800.0, ref.msupp.SupportRectangle(60, 40))
    elif kind == "ellipsoidal":
        t = tmirror.MirrorEllipsoidal(tsupp.SupportRound(35), SemiMajorAxis=600.0, SemiMinorAxis=300.0)
        r = ref.mmirror.MirrorEllipsoidal(ref.msupp.SupportRound(35), SemiMajorAxis=600.0, SemiMinorAxis=300.0)
    else:
        t = tmirror.MirrorPlane(tsupp.SupportRectangle(50, 50))
        r = ref.mmirror.MirrorPlane(ref.msupp.SupportRectangle(50, 50))
    pose = _pose([300.0, 0, 0], [-1.0, 0.15, 0.05], [0.15, 1.0, 0.0] if kind != "plane" else [0.15, 1.0, 0.0])
    # majoraxis must be orthogonal to normal: orthogonalize like the reference user would
    p, n, m = pose
    n = n / np.linalg.norm(n)
    m = m - np.dot(m, n) * n
    m = m / np.linalg.norm(m)
    out, ref_out = _trace_both([t], [r], [(p, n, m)], raylist)
    _assert_ray_parity(out, ref_out)


# ----------------------------------------------------------------- detector


def test_detector_parity_spot_delays():
    """Detector autoplacement, impact points, fs delays, and spot/duration SDs
    match the reference (ART/ModuleDetector.py:109-279)."""
    props = {"Divergence": 30e-3, "SourceSize": 0.0, "Wavelength": 50e-6, "DeltaFT": 1.0, "NumberRays": 250}
    t_opt = [tmirror.MirrorParabolic(400.0, 15.0, tsupp.SupportRound(40))]
    r_opt = [ref.mmirror.MirrorParabolic(400.0, 15.0, ref.msupp.SupportRound(40))]
    dist, inc = [412.0], [7.5]

    ours = OEPlacement(props, t_opt, dist, inc)
    refs = ref.mp.OEPlacement(props, r_opt, dist, inc)
    ours.source_rays = _ref_source_to_bundle(refs.source_rays)

    out = ours.trace_final()
    ref_out = ref.mp.RayTracingCalculation(copy.deepcopy(refs.source_rays), refs.optical_elements)[-1]

    det_t = Detector(ours.optical_elements[-1].position)
    det_t.autoplace(out, 390.0)
    det_r = ref.mdet.Detector(refs.optical_elements[-1].position)
    det_r.autoplace(ref_out, 390.0)
    np.testing.assert_allclose(det_t.centre, det_r.centre, atol=1e-8)
    np.testing.assert_allclose(det_t.normal, det_r.normal, atol=1e-10)

    numbers = np.array([r.number for r in ref_out])
    pts3_r = np.array(det_r.get_PointList3D(ref_out), dtype=float)
    pts3_t = np.asarray(det_t.get_PointList3D(out))[numbers]
    np.testing.assert_allclose(pts3_t, pts3_r, atol=1e-8)

    delays_r = np.array(det_r.get_Delays(ref_out), dtype=float)  # fs, mean-removed
    delays_t = np.asarray(det_t.get_Delays(out))[numbers]
    np.testing.assert_allclose(delays_t - delays_t.mean(), delays_r - delays_r.mean(), atol=1e-6)

    # spot SD (rotation-invariant) and duration SD
    pts2_r = np.array(det_r.get_PointList2DCentre(ref_out), dtype=float)
    spot_r = ref.mp.StandardDeviation(list(pts2_r))
    spot_t, dur_t = (float(x) for x in det_t.get_SpotAndDuration(out))
    np.testing.assert_allclose(spot_t, spot_r, rtol=1e-9)
    dur_r = ref.mp.StandardDeviation(list(delays_r))
    np.testing.assert_allclose(dur_t, dur_r, rtol=1e-9)


# ----------------------------------------------------------------- gradients


def test_alignment_gradient_vs_reference_finite_difference():
    """jax.grad of the spot-variance loss w.r.t. a mirror roll angle matches a
    central finite difference computed entirely with the REFERENCE code
    (rotate_roll_by + RayTracingCalculation + Detector), per BASELINE.md."""
    props = {"Divergence": 20e-3, "SourceSize": 0.0, "Wavelength": 50e-6, "DeltaFT": 1.0, "NumberRays": 120}
    t_opt = [tmirror.MirrorParabolic(300.0, 90.0, tsupp.SupportRound(60))]
    r_opt = [ref.mmirror.MirrorParabolic(300.0, 90.0, ref.msupp.SupportRound(60))]
    dist, inc = [300.0], [45.0]

    ours = OEPlacement(props, t_opt, dist, inc)
    refs = ref.mp.OEPlacement(props, r_opt, dist, inc)
    ours.source_rays = _ref_source_to_bundle(refs.source_rays)

    out0 = ours.trace_final()
    assert bool(np.all(np.asarray(out0.alive))), "test needs a lossless chain"
    det = Detector(ours.optical_elements[-1].position)
    det.autoplace(out0, 290.0)

    centre = jnp.asarray(det.centre)
    normal = jnp.asarray(det.normal)
    rot = jnp.asarray(det._plane_rotation())
    elements = ours.device_elements()
    params = al.zero_params(len(elements), dtype=jnp.float64)

    grad = jax.grad(al.focus_loss)(
        params, ours.source_rays, elements, centre, normal, rot,
        duration_weight=0.0, survival_weight=0.0,
    )
    grad_roll = float(grad.angles[0, 1])  # d(spot variance [mm^2]) / d(roll [rad])

    def ref_spot_var(roll_deg: float) -> float:
        chain_elements = copy.deepcopy(refs.optical_elements)
        chain_elements[0].rotate_roll_by(roll_deg)
        out = ref.mp.RayTracingCalculation(copy.deepcopy(refs.source_rays), chain_elements)[-1]
        assert len(out) == len(refs.source_rays)
        det_r = ref.mdet.Detector(np.array(chain_elements[0].position))
        det_r.centre = np.array(det.centre)
        det_r.normal = np.array(det.normal)
        pts = np.array(det_r.get_PointList2DCentre(out), dtype=float)
        w = np.array([r.intensity for r in out])
        mu = (pts * w[:, None]).sum(0) / w.sum()
        return float((w[:, None] * (pts - mu) ** 2).sum() / w.sum())

    h = 5e-4  # degrees
    fd = (ref_spot_var(h) - ref_spot_var(-h)) / (2 * np.deg2rad(h))
    assert np.isclose(grad_roll, fd, rtol=2e-4), (grad_roll, fd)


# ------------------------------------------------------------------ defects


def test_fourrier_defect_map_parity():
    """Same NumPy RNG state => the synthesized PSD height map and both
    spectral-derivative maps match the reference Fourrier generator
    (ART/ModuleDefects.py:69-146), including the interpolated lookups the
    tracer consumes. (The ~1e-6 relative envelope is the reference's float32
    k-grid/phases vs our float64.)"""
    from attosecondraytracing_tpu.models.defects import Fourrier as OurFourrier

    sup_r = ref.msupp.SupportRectangle(40, 20)
    sup_t = tsupp.SupportRectangle(40, 20)
    rms_target = 2e-5
    np.random.seed(1234)
    ref_def = ref.mdef.Fourrier(sup_r, RMS=rms_target, slope=-2, smallest=0.5)
    np.random.seed(1234)
    our_def = OurFourrier(sup_t, RMS=rms_target, slope=-2, smallest=0.5)

    assert our_def.deformation.shape == ref_def.deformation.shape
    scale_h = float(np.std(ref_def.deformation))
    np.testing.assert_allclose(our_def.deformation, ref_def.deformation, atol=1e-5 * scale_h)
    scale_g = float(np.abs(ref_def.DerivX).max())
    np.testing.assert_allclose(our_def._slope_x.T, ref_def.DerivX, atol=1e-5 * scale_g)
    np.testing.assert_allclose(our_def._slope_y.T, ref_def.DerivY, atol=1e-5 * scale_g)

    # interpolated values/slopes at scattered points (what the tracer sees)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.0, 1.0, size=(64, 2)) * [19.0, 9.0]
    for x, y in pts:
        h_ref = float(np.asarray(ref_def.get_offset(np.array([x, y, 0.0]))).ravel()[0])
        np.testing.assert_allclose(our_def.offset_at(x, y), h_ref, atol=1e-5 * scale_h)
        g_ref = np.asarray(ref_def.DerivInterp(np.array([x, y, 0.0])), dtype=float).ravel()
        np.testing.assert_allclose(our_def.slopes_at(x, y), g_ref, atol=1e-5 * scale_g)


def test_deformed_mirror_fourrier_trace_parity():
    """CONFIG_deformed's scene shape: plane wave onto a Fourrier-deformed
    parabola at normal incidence, IgnoreDefects=True (the reference default:
    intersections shift along the ray by h/cos(alpha) but reflect off the
    undeformed normal, ART/ModuleMirror.py:969-980 + :933-936)."""
    from attosecondraytracing_tpu.models.defects import Fourrier as OurFourrier

    sup_r = ref.msupp.SupportRectangle(40, 40)
    sup_t = tsupp.SupportRectangle(40, 40)
    np.random.seed(7)
    d_r = ref.mdef.Fourrier(sup_r, RMS=1e-4, smallest=2.0)
    np.random.seed(7)
    d_t = OurFourrier(sup_t, RMS=1e-4, smallest=2.0)

    m_t = tmirror.DeformedMirror(tmirror.MirrorParabolic(25.4, 0.0, sup_t), [d_t])
    m_r = ref.mmirror.DeformedMirror(ref.mmirror.MirrorParabolic(25.4, 0.0, sup_r), [d_r])

    props = {"Divergence": 0.0, "SourceSize": 30.0, "Wavelength": 50e-6, "DeltaFT": 1.0, "NumberRays": 200}
    ours = OEPlacement(props, [m_t], [15.0], [0.0])
    refs = ref.mp.OEPlacement(props, [m_r], [15.0], [0.0])
    ours.source_rays = _ref_source_to_bundle(refs.source_rays)

    out = ours.trace_final(ignore_defects=True)
    ref_out = ref.mp.RayTracingCalculation(
        copy.deepcopy(refs.source_rays), refs.optical_elements, IgnoreDefects=True
    )[-1]
    # atol_inc: the on-axis ray hits at exactly normal incidence, where our
    # arccos(u.n) has the usual sqrt(eps) ~ 1e-8 rad noise floor (the
    # reference's arctan2 form is exact only there; see ops/trace.py)
    _assert_ray_parity(out, ref_out, atol_p=1e-8, atol_opl=1e-8, atol_inc=1e-7)


def test_deformed_mirror_defect_normal_trace_parity():
    """IgnoreDefects=False: reflection off the defect-composed normal
    (ART/ModuleMirror.py:952-961 + ModuleGeometry.py:394-407). Uses a Zernike
    defect — the one defect type whose get_normal carries the correct sign in
    the reference (docs/parity.md divergence #3 covers Fourrier/MeasuredMap)."""
    from attosecondraytracing_tpu.models.defects import Zernike as OurZernike

    coeffs = {(2, 0): 4e-4, (2, 2): -2.5e-4, (3, 1): 1.5e-4}
    sup_r = ref.msupp.SupportRound(30)
    sup_t = tsupp.SupportRound(30)
    d_t = OurZernike(sup_t, coeffs)
    d_r = ref.mdef.Zernike(sup_r, coeffs)

    m_t = tmirror.DeformedMirror(tmirror.MirrorSpherical(600.0, sup_t), [d_t])
    m_r = ref.mmirror.DeformedMirror(ref.mmirror.MirrorSpherical(600.0, sup_r), [d_r])

    props = {"Divergence": 20e-3, "SourceSize": 0.0, "Wavelength": 50e-6, "DeltaFT": 1.0, "NumberRays": 150}
    ours = OEPlacement(props, [m_t], [280.0], [10.0])
    refs = ref.mp.OEPlacement(props, [m_r], [280.0], [10.0])
    ours.source_rays = _ref_source_to_bundle(refs.source_rays)

    out = ours.trace_final(ignore_defects=False)
    ref_out = ref.mp.RayTracingCalculation(
        copy.deepcopy(refs.source_rays), refs.optical_elements, IgnoreDefects=False
    )[-1]
    _assert_ray_parity(out, ref_out, atol_p=1e-8, atol_opl=1e-8)
