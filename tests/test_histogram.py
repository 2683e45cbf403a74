"""Device-side detector images vs np.histogram2d, and sharded binning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attosecondraytracing_tpu.analysis import stats
from attosecondraytracing_tpu.analysis.histogram import delay_map, detector_image
from attosecondraytracing_tpu.models import mirrors as mmirror
from attosecondraytracing_tpu.models import supports as msupp
from attosecondraytracing_tpu.models.detector import Detector
from attosecondraytracing_tpu.models.placement import OEPlacement


@pytest.fixture(scope="module")
def traced():
    """A toroidal 2f-2f chain traced to 4000 rays + an autoplaced detector."""
    focal, inc = 500.0, 80.0
    R, r = mmirror.ReturnOptimalToroidalRadii(focal, inc)
    mirror = mmirror.MirrorToroidal(R, r, msupp.SupportRectangle(300, 50))
    props = {
        "Divergence": 15e-3, "SourceSize": 0, "Wavelength": 50e-6,
        "DeltaFT": 1, "NumberRays": 4000,
    }
    chain = OEPlacement(props, [mirror], [2 * focal], [inc])
    out = chain.get_output_rays()[-1]
    det = Detector(np.zeros(3))
    det.autoplace(out, 2 * focal - 30.0)  # off focus so the spot has structure
    return out, det


def test_detector_image_matches_histogram2d(traced):
    out, det = traced
    img, (lo, hi) = det.get_Image(out, bins=(64, 48))
    img = np.asarray(img)
    lo, hi = np.asarray(lo), np.asarray(hi)

    xy = np.asarray(det.get_PointList2D(out))
    w = np.asarray(out.alive, dtype=float) * np.asarray(out.intensity)
    ref, _, _ = np.histogram2d(
        xy[:, 0], xy[:, 1], bins=(64, 48),
        range=[[lo[0], hi[0]], [lo[1], hi[1]]], weights=w,
    )
    np.testing.assert_allclose(img, ref, atol=1e-9)
    # auto-extent covers every surviving ray: no weight lost
    assert img.sum() == pytest.approx(w.sum(), rel=1e-12)


def test_detector_image_fixed_extent_drops_outside(traced):
    out, det = traced
    lo = np.array([-0.05, -0.05])
    hi = np.array([0.05, 0.05])
    img, (lo2, hi2) = det.get_Image(out, bins=(32, 32), extent=(lo, hi))
    np.testing.assert_allclose(np.asarray(lo2), lo)
    np.testing.assert_allclose(np.asarray(hi2), hi)
    xy = np.asarray(det.get_PointList2D(out))
    w = np.asarray(out.alive, dtype=float) * np.asarray(out.intensity)
    inside = (
        (xy[:, 0] >= lo[0]) & (xy[:, 0] <= hi[0])
        & (xy[:, 1] >= lo[1]) & (xy[:, 1] <= hi[1])
    )
    assert np.asarray(img).sum() == pytest.approx(w[inside].sum(), rel=1e-12)


def test_delay_map_weighted_means(traced):
    out, det = traced
    mean, w_img, (lo, hi) = det.get_DelayMap(out, bins=(24, 24))
    mean, w_img = np.asarray(mean), np.asarray(w_img)
    lo, hi = np.asarray(lo), np.asarray(hi)

    xy = np.asarray(det.get_PointList2D(out))
    delays = np.asarray(det.get_Delays(out))
    w = np.asarray(out.alive, dtype=float) * np.asarray(out.intensity)
    nx, ny = 24, 24
    ix = np.clip(((xy[:, 0] - lo[0]) / (hi[0] - lo[0]) * nx).astype(int), 0, nx - 1)
    iy = np.clip(((xy[:, 1] - lo[1]) / (hi[1] - lo[1]) * ny).astype(int), 0, ny - 1)
    ref_w = np.zeros((nx, ny))
    ref_wd = np.zeros((nx, ny))
    np.add.at(ref_w, (ix, iy), w)
    np.add.at(ref_wd, (ix, iy), w * delays)
    np.testing.assert_allclose(w_img, ref_w, atol=1e-9)
    occupied = ref_w > 0
    np.testing.assert_allclose(mean[occupied], ref_wd[occupied] / ref_w[occupied], atol=1e-9)
    assert np.isnan(mean[~occupied]).all()
    # delays are centred on the alive-weighted mean, so the *unweighted* map
    # integrates to ~0 (matching Detector.get_Delays semantics)
    mean_u, w_u, _ = det.get_DelayMap(out, bins=(24, 24), intensity_weighted=False)
    mean_u, w_u = np.asarray(mean_u), np.asarray(w_u)
    assert abs(np.nansum(mean_u * w_u) / w_u.sum()) < 1e-6


def test_detector_image_sharded_matches_single_device(traced):
    """Binning a ('rays',)-sharded bundle gives the identical image: the
    scatter-add is additive, XLA inserts the cross-device reduce."""
    out, det = traced
    img_ref, (lo, hi) = det.get_Image(out, bins=(32, 32))

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("rays",))
    sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("rays"))
    sharded = jax.tree.map(
        lambda a: jax.device_put(a, sharding) if a.ndim >= 1 and a.shape[0] == out.n_rays else a,
        out,
    )
    img_sh, _ = detector_image(
        sharded, det.centre, det.normal, det._plane_rotation(),
        bins=(32, 32), extent=(np.asarray(lo), np.asarray(hi)),
    )
    np.testing.assert_allclose(np.asarray(img_sh), np.asarray(img_ref), atol=1e-9)


def test_detector_image_grad_flows_through_intensity(traced):
    """The image is differentiable in the ray intensities (weights)."""
    out, det = traced
    lo, hi = np.array([-1.0, -1.0]), np.array([1.0, 1.0])
    rot = det._plane_rotation()

    def pixel_mass(intensity):
        b = out._replace(intensity=intensity)
        img, _ = detector_image(
            b, det.centre, det.normal, rot, bins=(8, 8), extent=(lo, hi)
        )
        return jnp.sum(img)

    g = jax.grad(pixel_mass)(out.intensity)
    # d(total mass)/d(intensity_i) = alive_i for in-window rays
    xy = np.asarray(det.get_PointList2D(out))
    inside = (np.abs(xy) <= 1.0).all(axis=1)
    expect = np.asarray(out.alive, dtype=float) * inside
    np.testing.assert_allclose(np.asarray(g), expect, atol=1e-12)
