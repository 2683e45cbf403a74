"""End-to-end physics property tests: known analytic optics results
(SURVEY.md §4's test strategy — the reference itself has no tests).

Stigmatic configurations (OAP, ellipsoid) are verified by measuring ray
convergence to the *analytic focal point* (distances < nm in float64); the
detector-plane metrics are validated separately with realistic tolerances,
since ``autoplace`` centers the plane on the mean ray, not the exact focus
(same as the reference).
"""

import numpy as np

from attosecondraytracing_tpu.analysis import stats
from attosecondraytracing_tpu.models import mirrors as mmirror
from attosecondraytracing_tpu.models import sources as msource  # noqa: F401
from attosecondraytracing_tpu.models import supports as msupp
from attosecondraytracing_tpu.models.detector import Detector
from attosecondraytracing_tpu.models.masks import Mask
from attosecondraytracing_tpu.models.placement import OEPlacement
from attosecondraytracing_tpu.ops.bundle import total_path


def _source_props(**kw):
    props = {
        "Divergence": 0,
        "SourceSize": 0,
        "Wavelength": 50e-6,
        "DeltaFT": 1,
        "NumberRays": 500,
    }
    props.update(kw)
    return props


def _final_bundle(chain):
    return chain.get_output_rays()[-1]


def _detector_at(chain, distance):
    det = Detector(chain.optical_elements[-1].position)
    det.autoplace(_final_bundle(chain), distance)
    return det


def _local_to_lab(element, q_local):
    R = element.frame_rotation()
    return R.T @ (np.asarray(q_local) - element.type.get_centre()) + element.position


def _dist_to_point(bundle, F):
    """Per-ray distance of the ray line to point F (0 for rays through F)."""
    p = np.asarray(bundle.p)
    d = np.asarray(bundle.d)
    rel = F - p
    t = np.sum(rel * d, axis=-1)
    closest = p + t[:, None] * d
    return np.linalg.norm(closest - F, axis=-1), t


def test_oap_focuses_plane_wave_to_point():
    """A perfect off-axis parabola focuses a plane wave to a stigmatic point;
    all optical paths to the focus are equal (Fermat)."""
    feff = 100.0
    parabola = mmirror.MirrorParabolic(feff, 90, msupp.SupportRound(12))
    chain = OEPlacement(_source_props(SourceSize=20), [parabola], [200], [0.0])
    out = _final_bundle(chain)
    assert np.asarray(out.alive).all()
    # parabola focus in optic coordinates: (0, 0, p/2)
    F = _local_to_lab(chain.optical_elements[0], [0.0, 0.0, parabola.p / 2])
    np.testing.assert_allclose(np.linalg.norm(F - chain.optical_elements[0].position), feff, rtol=1e-12)
    miss, t_to_F = _dist_to_point(out, F)
    assert miss.max() < 1e-9  # stigmatic to float64 precision
    opl_total = np.asarray(total_path(out)) + t_to_F
    assert np.ptp(opl_total) < 1e-9  # mm; Fermat: equal OPL to the focus


def test_oap_45deg_also_stigmatic():
    feff = 150.0
    parabola = mmirror.MirrorParabolic(feff, 45, msupp.SupportRound(10))
    chain = OEPlacement(_source_props(SourceSize=15), [parabola], [300], [0.0])
    out = _final_bundle(chain)
    assert np.asarray(out.alive).all()
    F = _local_to_lab(chain.optical_elements[0], [0.0, 0.0, parabola.p / 2])
    miss, _ = _dist_to_point(out, F)
    assert miss.max() < 1e-9


def test_spherical_mirror_paraxial_focal_length():
    """Plane wave onto a concave sphere: the waist (smallest spread) sits at
    R/2 up to spherical aberration."""
    R = 2000.0
    mirror = mmirror.MirrorSpherical(R, msupp.SupportRound(5))
    chain = OEPlacement(_source_props(SourceSize=8), [mirror], [500], [0.0])
    out = _final_bundle(chain)
    assert np.asarray(out.alive).all()
    # paraxial focus: R/2 from the mirror centre back along the incoming axis
    P = chain.optical_elements[0].position
    F = P + np.array([-1.0, 0, 0]) * (R / 2)
    miss, _ = _dist_to_point(out, F)
    # transverse spherical aberration ~ h^2*r/(2R^2)-scale: small but nonzero
    assert miss.max() < 5e-3
    assert miss.max() > 1e-9


def test_toroidal_2f_2f_stigmatic():
    """Toroid with ReturnOptimalToroidalRadii refocuses a point source 2f-2f
    with vanishing astigmatism (spot ~ 10s of µm, not the ~mm of a sphere)."""
    focal, incidence = 500.0, 80.0
    R, r = mmirror.ReturnOptimalToroidalRadii(focal, incidence)
    mirror = mmirror.MirrorToroidal(R, r, msupp.SupportRectangle(300, 50))
    chain = OEPlacement(
        _source_props(Divergence=30e-3 / 2), [mirror], [2 * focal], [incidence]
    )
    out = _final_bundle(chain)
    assert np.asarray(out.alive).mean() > 0.99
    det = _detector_at(chain, 2 * focal)
    spot, duration = det.get_SpotAndDuration(out)
    assert float(spot) < 0.1
    # far better than the ~mm astigmatic blur of a spherical mirror at 80 deg
    assert float(spot) < 1.0


def test_ellipsoidal_f_to_f_imaging():
    """Point source in one focus of an ellipsoid refocuses in the other focus
    exactly (stigmatic by construction)."""
    f_obj = f_img = 600.0
    incidence = 75.0
    a, b = mmirror.ReturnOptimalEllipsoidalAxes(f_obj, incidence)
    mirror = mmirror.MirrorEllipsoidal(msupp.SupportRectangle(80, 30), a, b)
    chain = OEPlacement(_source_props(Divergence=10e-3), [mirror], [f_obj], [incidence])
    out = _final_bundle(chain)
    assert np.asarray(out.alive).mean() > 0.99
    # image point: f_img along the outgoing central ray from the mirror centre
    P = chain.optical_elements[0].position
    c_dir = np.asarray(stats.central_direction(out))
    c_dir = c_dir / np.linalg.norm(c_dir)
    # central direction approximates the chief ray; get it exactly instead:
    from attosecondraytracing_tpu.ops.host_trace import HostRay, trace_ray

    central = trace_ray(HostRay(np.zeros(3), [1.0, 0, 0]), chain.optical_elements)[-1]
    F = central.point + central.vector * f_img
    miss, t_to_F = _dist_to_point(out, F)
    assert miss[np.asarray(out.alive)].max() < 1e-8
    opl_total = np.asarray(total_path(out)) + t_to_F
    assert np.ptp(opl_total[np.asarray(out.alive)]) < 1e-8


def test_mask_blocks_and_transmission():
    """A mask with a hole acts as an aperture stop; energy transmission is the
    intensity-weighted survivor fraction (getETransmission semantics)."""
    mask = Mask(msupp.SupportRoundHole(Radius=30, RadiusHole=7, CenterHoleX=0, CenterHoleY=0))
    mirror = mmirror.MirrorPlane(msupp.SupportRound(50))
    chain = OEPlacement(_source_props(Divergence=25e-3), [mask, mirror], [400, 100], [0, 45])
    outs = chain.get_output_rays()
    src = chain.source_rays
    after_mask = outs[0]
    alive = np.asarray(after_mask.alive)
    assert 0.05 < alive.mean() < 0.95
    # rays within the 7 mm hole at 400 mm pass: half-angle atan(7/400)
    angles = np.arccos(np.clip(np.asarray(src.d) @ np.array([1.0, 0, 0]), -1, 1))
    expected = angles < np.arctan(7 / 400)
    assert (alive == expected).mean() > 0.99  # edge rays may differ
    final_alive = np.asarray(outs[-1].alive)
    et = float(stats.energy_transmission(src, outs[-1]))
    w = np.asarray(src.intensity)
    np.testing.assert_allclose(et, 100 * w[final_alive].sum() / w.sum(), rtol=1e-6)


def test_roll_misalignment_blurs_oap_focus():
    """Rolling the OAP by 50 µrad moves/blurs the focus (reference example
    CONFIG_singleparabola); a perfect OAP stays stigmatic."""
    feff = 100.0
    parabola = mmirror.MirrorParabolic(feff, 90, msupp.SupportRoundHole(30, 5, 10, 5))
    chain = OEPlacement(_source_props(SourceSize=50, Wavelength=800e-6), [parabola], [200], [0.0])
    F = _local_to_lab(chain.optical_elements[0], [0.0, 0.0, parabola.p / 2])
    out0 = _final_bundle(chain)
    miss0, _ = _dist_to_point(out0, F)
    miss0 = miss0[np.asarray(out0.alive)]

    chain.optical_elements[0].rotate_roll_by(np.rad2deg(50e-6))
    out1 = chain.get_output_rays()[-1]
    miss1, _ = _dist_to_point(out1, F)
    miss1 = miss1[np.asarray(out1.alive)]
    assert miss0.max() < 1e-9
    assert miss1.mean() > 1e-4  # tens of µm-scale smear from 50 µrad roll


def test_collimating_telescope_chain():
    """CX sphere + CC sphere + OAP (CONFIG_CollimatingTelescope): rays survive
    the 3-element chain and focus to a small spot at feff."""
    cx = mmirror.MirrorSpherical(-1500, msupp.SupportRound(25))
    cc = mmirror.MirrorSpherical(2500, msupp.SupportRound(25))
    oap = mmirror.MirrorParabolic(100, 90, msupp.SupportRound(25))
    chain = OEPlacement(
        _source_props(Divergence=2.2e-3, Wavelength=780e-6),
        [cx, cc, oap],
        [5000, 598, 1000],
        [5, 3.4, 0.04],
    )
    out = _final_bundle(chain)
    assert np.asarray(out.alive).mean() > 0.95
    det = _detector_at(chain, 100)
    spot, duration = det.get_SpotAndDuration(out)
    assert float(spot) < 0.05  # mm — aberrated but focused


def test_convex_mirror_flip_diverges():
    """A convex sphere (negative radius) reflects from the back side (the
    placement flips it by 180 deg) and makes a plane wave diverge."""
    cx = mmirror.MirrorSpherical(-1500, msupp.SupportRound(25))
    chain = OEPlacement(_source_props(SourceSize=30), [cx], [500], [4.0])
    out = _final_bundle(chain)
    assert np.asarray(out.alive).all()
    d = np.asarray(out.d)
    # divergence: direction spread grows away from the mean
    mean_d = d.mean(axis=0)
    mean_d /= np.linalg.norm(mean_d)
    ang = np.arccos(np.clip(d @ mean_d, -1, 1))
    assert ang.max() > 1e-3
    # and rays actually moved back toward -x (reflected, not transmitted)
    assert mean_d[0] < 0
