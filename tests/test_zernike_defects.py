"""Zernike recurrence parity (against the reference's dependency-free
generator, imported straight from /root/reference) and defect-map behavior."""

import importlib.util
import sys

import numpy as np
import pytest

from attosecondraytracing_tpu.models import defects as mdef
from attosecondraytracing_tpu.models import supports as msupp
from attosecondraytracing_tpu.ops.defects import defect_offset, defect_slopes
from attosecondraytracing_tpu.ops.zernike import zernike_value_and_grad


def _load_reference_zernike():
    spec = importlib.util.spec_from_file_location(
        "ref_zernike", "/root/reference/ART/recursive_zernike_generator.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_zernike"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("max_order", [3, 6])
def test_zernike_matches_reference_recurrence(max_order, rng):
    ref = _load_reference_zernike()
    x = rng.uniform(-0.7, 0.7, size=12)
    y = rng.uniform(-0.7, 0.7, size=12)
    ref_z, ref_dx, ref_dy = ref.zernike_gradient(list(x), list(y), max_order)
    Z, DX, DY = zernike_value_and_grad(x, y, max_order)
    for n in range(0, max_order + 1):
        for m in range(0, n + 1):
            np.testing.assert_allclose(np.asarray(Z[(n, m)]), np.asarray(ref_z[(n, m)][0][1]), atol=1e-12)
            np.testing.assert_allclose(np.asarray(DX[(n, m)]), np.asarray(ref_dx[(n, m)][0][1]), atol=1e-12)
            np.testing.assert_allclose(np.asarray(DY[(n, m)]), np.asarray(ref_dy[(n, m)][0][1]), atol=1e-12)


def test_zernike_gradient_is_derivative(rng):
    """DX/DY really are the Cartesian derivatives of Z (finite differences)."""
    x = rng.uniform(-0.6, 0.6, size=8)
    y = rng.uniform(-0.6, 0.6, size=8)
    eps = 1e-6
    Z, DX, DY = zernike_value_and_grad(x, y, 5)
    Zx, _, _ = zernike_value_and_grad(x + eps, y, 5)
    Zy, _, _ = zernike_value_and_grad(x, y + eps, 5)
    for key in [(2, 1), (3, 2), (4, 2), (5, 3)]:
        np.testing.assert_allclose(np.asarray(DX[key]), (np.asarray(Zx[key]) - np.asarray(Z[key])) / eps, atol=1e-4)
        np.testing.assert_allclose(np.asarray(DY[key]), (np.asarray(Zy[key]) - np.asarray(Z[key])) / eps, atol=1e-4)


def test_zernike_defect_device_matches_host(rng):
    support = msupp.SupportRound(20)
    defect = mdef.Zernike(support, {(2, 0): 1e-4, (3, 1): -2e-4, (4, 2): 5e-5})
    dev = defect.device_defect()
    x = rng.uniform(-10, 10, size=50)
    y = rng.uniform(-10, 10, size=50)
    np.testing.assert_allclose(np.asarray(defect_offset(dev, x, y)), defect.offset_at(x, y), atol=1e-12)
    gx_d, gy_d = defect_slopes(dev, x, y)
    gx_h, gy_h = defect.slopes_at(x, y)
    np.testing.assert_allclose(np.asarray(gx_d), gx_h, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gy_d), gy_h, atol=1e-12)
    assert defect.RMS() == pytest.approx(np.sqrt(1e-8 + 4e-8 + 2.5e-9))


def test_fourrier_defect_rms_and_interpolation():
    support = msupp.SupportRectangle(40, 40)
    defect = mdef.Fourrier(support, RMS=1e-4, smallest=1.0, seed=7)
    assert defect.RMS() == pytest.approx(1e-4, rel=1e-6)
    # device bilinear lookup matches the host grid at the nodes
    dev = defect.device_defect()
    x = np.array([0.0, 5.0, -7.5])
    y = np.array([0.0, -3.0, 6.25])
    np.testing.assert_allclose(
        np.asarray(defect_offset(dev, x, y)), defect.offset_at(x, y), rtol=1e-6, atol=1e-12
    )
    # slopes approximate the height-map derivative (spectral, so only roughly
    # equal to finite differences of the interpolated map)
    gx, gy = defect.slopes_at(x, y)
    assert np.all(np.isfinite(gx)) and np.all(np.isfinite(gy))


def test_measured_map_roundtrip(rng):
    support = msupp.SupportRectangle(30, 20)
    xx, yy = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 24), indexing="ij")
    surface_map = 1e-4 * np.sin(2 * np.pi * xx) * np.cos(2 * np.pi * yy)
    defect = mdef.MeasuredMap(support, surface_map)
    assert defect.RMS() == pytest.approx(np.std(surface_map))
    dev = defect.device_defect()
    x = rng.uniform(-10, 10, size=20)
    y = rng.uniform(-8, 8, size=20)
    np.testing.assert_allclose(np.asarray(defect_offset(dev, x, y)), defect.offset_at(x, y), atol=1e-12)


def test_deformed_mirror_offset_shifts_path():
    """A uniform-ish height error shifts the optical path by ~2*h*cos(alpha)
    on reflection at normal incidence (h along the ray in and out)."""
    from attosecondraytracing_tpu.models import mirrors as mmirror
    from attosecondraytracing_tpu.models.placement import OEPlacement

    support = msupp.SupportRectangle(40, 40)
    mirror = mmirror.MirrorPlane(support)
    h0 = 1e-3
    defect = mdef.Zernike(support, {(2, 0): 0.0, (0, 0): 0.0})
    # build a piston via a measured map (constant height h0)
    piston = mdef.MeasuredMap(support, np.full((16, 16), h0))
    deformed = mmirror.DeformedMirror(mirror, [piston])
    props = {"Divergence": 0, "SourceSize": 20, "Wavelength": 50e-6, "DeltaFT": 1, "NumberRays": 100}
    chain_flat = OEPlacement(props, [mirror], [100], [10])
    chain_def = OEPlacement(props, [deformed], [100], [10])
    opl_flat = np.asarray(chain_flat.get_output_rays()[-1].opl)
    opl_def = np.asarray(chain_def.get_output_rays()[-1].opl)
    # the deformed intersection sits h/cos(alpha) earlier along the ray
    expected = h0 / np.cos(np.deg2rad(10))
    np.testing.assert_allclose(opl_flat - opl_def, expected, rtol=1e-6)
