"""Runtime-scalar-pose scan kernel (ops/pallas_scan.py) vs the baked-pose
moments kernel: every chain of a structurally-uniform parameter scan must
reproduce the baked kernel's statistics through ONE compiled kernel whose
poses arrive as SMEM scalars (VERDICT r3 #1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from attosecondraytracing_tpu.models import masks as mmask
from attosecondraytracing_tpu.models import mirrors as mmirror
from attosecondraytracing_tpu.models import supports as msupp
from attosecondraytracing_tpu.models.detector import Detector
from attosecondraytracing_tpu.models.placement import OEPlacement
from attosecondraytracing_tpu.ops import pallas_scan as ps
from attosecondraytracing_tpu.ops import pallas_trace as pt
from attosecondraytracing_tpu.ops.trace import trace_jit


def _flagship(n_rays=16, divergence=25e-3):
    focal, inc = 500.0, 80.0
    R, r = mmirror.ReturnOptimalToroidalRadii(focal, inc)
    tor = mmirror.MirrorToroidal(R, r, msupp.SupportRectangle(150, 32))
    mask = mmask.Mask(msupp.SupportRoundHole(20, 7, 0, 0))
    props = {"Divergence": divergence, "SourceSize": 0, "Wavelength": 80e-6,
             "DeltaFT": 0.5, "NumberRays": n_rays}
    return OEPlacement(props, [mask, tor, tor], [400, 100, 500],
                       [0, inc, -inc], [0, 0, 0])


def _f32_elements(chain):
    return [e.to_device(dtype=jnp.float32) for e in chain.optical_elements]


def _detector_for(chain, elements, n=20000, offset=-10.0):
    spec = chain.source_spec.baked()
    out = trace_jit(pt.source_bundle(spec, n, wavelength=80e-6), elements)
    det = Detector(np.zeros(3))
    det.autoplace(out, 500.0 + offset)
    return det


def _stats_of_moments(mom, distances):
    sums = pt.moments_to_distance_sums(mom["moments"], distances,
                                       mom["centre_distance"])
    return pt.sums_to_stats(sums, mom["opl_ref"], distances)


def _assert_stats_close(res_a, res_b, w_rtol=2e-3):
    np.testing.assert_allclose(res_a["sum_w"], res_b["sum_w"], rtol=w_rtol)
    np.testing.assert_allclose(res_a["spot_sd"], res_b["spot_sd"], rtol=5e-3,
                               atol=1e-6)
    for k, r in zip(res_a["duration_sd"], res_b["duration_sd"]):
        # f32 OPL noise adds in quadrature (same envelope as the stats tests)
        assert abs(k - r) <= 0.03 * r or abs(k * k - r * r) ** 0.5 <= 0.9, (k, r)


N = 20000
DISTANCES = (-10.0, 0.0, 10.0)


@pytest.fixture(scope="module")
def base():
    chain = _flagship(16)
    elements = _f32_elements(chain)
    det = _detector_for(chain, elements)
    spec = ps.make_scan_spec("cone", elements, N)
    return chain, elements, det, spec


def test_scan_kernel_matches_baked_kernel(base):
    chain, elements, det, spec = base
    baked_src = chain.source_spec.baked()
    mom_ref = pt.pallas_source_detector_moments(
        baked_src, elements, N, det.centre, det.normal, det._plane_rotation())
    fn = ps.make_moments_fn(spec, elements, chain.source_spec, N)
    mom_scan = fn(det.centre, det.normal, det._plane_rotation())
    assert mom_scan["opl_ref"] == pytest.approx(mom_ref["opl_ref"], abs=1e-6)
    _assert_stats_close(_stats_of_moments(mom_scan, DISTANCES),
                        _stats_of_moments(mom_ref, DISTANCES))


def test_scan_kernel_gaussian_weights(base):
    chain, elements, det, spec = base
    edge = float(1 / np.e**2)
    baked_src = chain.source_spec.baked()
    mom_ref = pt.pallas_source_detector_moments(
        baked_src, elements, N, det.centre, det.normal, det._plane_rotation(),
        gaussian_edge=edge)
    fn = ps.make_moments_fn(spec, elements, chain.source_spec, N)
    mom_scan = fn(det.centre, det.normal, det._plane_rotation(),
                  gaussian_edge=edge)
    _assert_stats_close(_stats_of_moments(mom_scan, DISTANCES),
                        _stats_of_moments(mom_ref, DISTANCES))


def test_scan_kernel_perturbed_chains_one_spec(base):
    """THE scan property: chains perturbed in pose (rotations, shifts, the
    OEPlacement distance axis) evaluate through the SAME ScanSpec — only the
    runtime scalars change — and reproduce the baked kernel re-baked on each
    perturbed chain."""
    chain, elements, det, spec = base
    loops = (
        chain.get_OE_loop_list(1, "pitch", [0.02])[0],
        chain.get_OE_loop_list(2, "shift_normal", [0.5])[0],
        chain.get_OE_loop_list(1, "roll", [0.3])[0],
    )
    for mod in loops:
        els = _f32_elements(mod)
        mom_ref = pt.pallas_source_detector_moments(
            mod.source_spec.baked(), els, N, det.centre, det.normal,
            det._plane_rotation())
        fn = ps.make_moments_fn(spec, els, mod.source_spec, N)
        mom_scan = fn(det.centre, det.normal, det._plane_rotation())
        _assert_stats_close(_stats_of_moments(mom_scan, DISTANCES),
                            _stats_of_moments(mom_ref, DISTANCES))


def test_scan_kernel_chunking_matches_single_pass(base):
    """>2^23-ray chunking exercised with a small fake chunk limit via the
    (phase, k_frac) law: two half-range calls must sum to the full call."""
    chain, elements, det, spec = base
    fn = ps.make_moments_fn(spec, elements, chain.source_spec, N)
    full = fn(det.centre, det.normal, det._plane_rotation())

    baked_src = chain.source_spec.baked()
    opl_ref, _o, inv_dn = pt.chief_ray_refs(
        baked_src, elements, det.centre, det.normal, (0.0,))
    svec = ps.scan_chain_scalars(
        elements, np.asarray(baked_src.rot), np.asarray(baked_src.origin),
        det.centre, det.normal, det._plane_rotation())
    half = N // 2
    parts = np.zeros(len(pt.MOMENT_FIELDS))
    for off in (0, half):
        parts += ps.scan_moments(
            spec, svec, half, opl_ref, inv_dn, radius=baked_src.radius,
            phase=float(np.mod(off * pt._PHI_FRAC, 1.0)), k_frac=off / N)
    np.testing.assert_allclose(parts, full["moments"], rtol=1e-4, atol=1e-4)


def test_optimizer_with_scan_moments_fn(base):
    """FindOptimalDistancePallas driven by the runtime-scalar kernel lands on
    the baked kernel's optimum; last_moments records the surviving weight."""
    from attosecondraytracing_tpu.analysis.optimizer import (
        FindOptimalDistancePallas,
    )

    chain, elements, det, spec = base
    baked_src = chain.source_spec.baked()
    d_ref, spot_ref, _ = FindOptimalDistancePallas(
        baked_src, elements, N, det, OptFor="spotsize", Amplitude=30.0,
        Precision=3)
    rec = {}
    fn = ps.make_moments_fn(spec, elements, chain.source_spec, N)
    d_scan, spot_scan, _ = FindOptimalDistancePallas(
        baked_src, elements, N, det, OptFor="spotsize", Amplitude=30.0,
        Precision=3, moments_fn=fn, last_moments=rec)
    assert d_scan.get_distance() == pytest.approx(d_ref.get_distance(), abs=0.05)
    assert spot_scan == pytest.approx(spot_ref, rel=5e-3, abs=1e-6)
    assert rec["moments"][0] > 0  # surviving weight recorded


def test_total_source_weight_closed_form():
    edge = float(1 / np.e**2)
    n = 12345
    direct = float(np.exp(np.log(edge) * np.arange(n) / n).sum())
    assert ps.total_source_weight(n, edge) == pytest.approx(direct, rel=1e-12)
    assert ps.total_source_weight(n, None) == n


def test_scan_scalars_composed_in_float64(base):
    """Contract (hardware regression, bf16-matmul bug): the pose scalar
    vector must equal an independent float64 composition to f32-storage
    precision. On a TPU, eager jnp composition runs bf16 matmul passes whose
    ~1e-3 rotation errors displace the traced geometry by ~0.5 mm."""
    from attosecondraytracing_tpu.ops.trace import MirrorElement, compose_chain

    chain, elements, det, spec = base
    baked_src = chain.source_spec.baked()
    Rs = np.asarray(baked_src.rot, np.float64)
    origin = np.asarray(baked_src.origin, np.float64)
    det_rot = det._plane_rotation()
    svec = ps.scan_chain_scalars(elements, Rs, origin, det.centre,
                                 det.normal, det_rot)

    maps, (R_K, pos_K) = compose_chain(elements)
    pos0 = np.asarray(elements[0].position, np.float64)
    cen0 = (np.asarray(elements[0].centre, np.float64)
            if isinstance(elements[0], MirrorElement) else np.zeros(3))
    M0, _b0 = maps[0]
    maps = [(np.asarray(M0) @ Rs, np.asarray(M0) @ (origin - pos0) + cen0)] + [
        (np.asarray(M), np.asarray(b)) for M, b in maps[1:]]
    parts = []
    for M, b in maps:
        parts.append(np.asarray(M).reshape(-1))
        parts.append(np.asarray(b))
    c_rel = R_K @ (np.asarray(det.centre, np.float64) - pos_K)
    n_rel = R_K @ np.asarray(det.normal, np.float64)
    rot = np.asarray(det_rot, np.float64)
    parts += [c_rel, n_rel, R_K @ rot[0], R_K @ rot[1]]
    ref64 = np.concatenate(parts)

    assert svec.dtype == np.float32
    # f32 storage of exact f64 values: error <= 1 ulp of each entry
    ulp = np.maximum(np.abs(ref64), 1.0) * 1.2e-7
    np.testing.assert_array_less(np.abs(svec - ref64), ulp + 1e-12)


def test_scan_kernel_divergence_axis(base):
    """The source divergence is a runtime aux scalar: a divergence scan
    evaluates through the SAME ScanSpec (no recompile) and matches the baked
    kernel re-baked at the new divergence."""
    chain, elements, det, spec = base
    mod = chain.get_source_loop_list("divergence", [32e-3])[0]
    assert mod.source_spec is not None and mod.source_spec.param == 32e-3
    els = _f32_elements(mod)
    mom_ref = pt.pallas_source_detector_moments(
        mod.source_spec.baked(), els, N, det.centre, det.normal,
        det._plane_rotation())
    fn = ps.make_moments_fn(spec, els, mod.source_spec, N)
    mom_scan = fn(det.centre, det.normal, det._plane_rotation())
    _assert_stats_close(_stats_of_moments(mom_scan, DISTANCES),
                        _stats_of_moments(mom_ref, DISTANCES))


def test_sharded_scan_moments_match_single_device(base):
    """scan_moments_sharded over the 8-virtual-device mesh == the
    single-device runtime-scalar scan kernel (same global spiral via
    per-shard (phase, k_frac) offsets; partial moment rows combined across
    shards) — the multi-chip parameter-scan engine (VERDICT r4 #5)."""
    import jax

    from attosecondraytracing_tpu.parallel.mesh import scan_moments_sharded

    chain, elements, det, spec = base
    baked_src = chain.source_spec.baked()
    opl_ref, _o, inv_dn = pt.chief_ray_refs(
        baked_src, elements, det.centre, det.normal, (0.0,))
    svec = ps.scan_chain_scalars(
        elements, np.asarray(baked_src.rot), np.asarray(baked_src.origin),
        det.centre, det.normal, det._plane_rotation())
    n_total = 16384  # divides over 8 devices
    mom_1 = ps.scan_moments(spec, svec, n_total, opl_ref, inv_dn,
                            radius=baked_src.radius)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("rays",))
    mom_8 = scan_moments_sharded(spec, svec, n_total, mesh, opl_ref, inv_dn,
                                 radius=baked_src.radius)
    rec = {"opl_ref": opl_ref, "centre_distance": 0.0}
    _assert_stats_close(
        _stats_of_moments({**rec, "moments": mom_8}, DISTANCES),
        _stats_of_moments({**rec, "moments": mom_1}, DISTANCES))
    # the extended kind must refuse (shard offsets would split sub-sources)
    with pytest.raises(NotImplementedError):
        scan_moments_sharded(spec._replace(source_kind="extended"), svec,
                             n_total, mesh, opl_ref, inv_dn)


def test_scan_mesh_env_shards_moments_fn(base, monkeypatch):
    """ART_TPU_SCAN_MESH=1 routes make_moments_fn through the sharded scan
    kernel on a multi-device host; the optimizer-facing moments match the
    single-device closure."""
    chain, elements, det, _spec = base
    n = 16384  # divides over the 8 virtual devices
    spec = ps.make_scan_spec("cone", elements, n)
    fn_1 = ps.make_moments_fn(spec, elements, chain.source_spec, n)
    mom_1 = fn_1(det.centre, det.normal, det._plane_rotation())
    monkeypatch.setenv("ART_TPU_SCAN_MESH", "1")
    assert ps._scan_mesh(spec, n) is not None
    fn_8 = ps.make_moments_fn(spec, elements, chain.source_spec, n)
    mom_8 = fn_8(det.centre, det.normal, det._plane_rotation())
    rec = {"opl_ref": mom_1["opl_ref"], "centre_distance": 0.0}
    _assert_stats_close(
        _stats_of_moments({**rec, "moments": mom_8["moments"]}, DISTANCES),
        _stats_of_moments({**rec, "moments": mom_1["moments"]}, DISTANCES))
    # alignment-constrained kinds refuse the mesh (stay single-device)
    assert ps._scan_mesh(spec._replace(source_kind="extended"), n) is None
    assert ps._scan_mesh(spec, n + 3) is None  # non-dividing ray count


def test_driver_fused_scan_monte_carlo(monkeypatch):
    """Monte-Carlo tolerancing (every element randomly rotated AND shifted,
    masks included) routes through the fused scan engine and matches the
    legacy per-chain path — the all-pose-scalars stress case."""
    from attosecondraytracing_tpu import main as amain
    from attosecondraytracing_tpu.models import chain as mchain

    monkeypatch.setattr(mchain, "PALLAS_MIN_RAYS", 1024)
    monkeypatch.setattr(mchain.OpticalChain, "_pallas_eligible",
                        lambda self, els: True)
    monkeypatch.setattr(amain, "_CLI_ACTIVE", True)

    sp = {"NumberRays": 4096}
    do = {"AutoDetectorDistance": True, "DistanceDetector": 500.0,
          "OptFor": "spotsize"}
    ao = {"verbose": False, "save_results": False}

    # one chain list, reused by both paths: rotate_random_by draws its axis
    # from the GLOBAL NumPy RNG, so rebuilding would give different chains
    rng = np.random.default_rng(11)
    chains = _flagship(4096).get_OE_random_loop_list(0.05, 0.2, 3, rng=rng)
    kept = amain.main(chains, sp, do, ao)
    assert all(c.last_trace_engine == "pallas-scan" for c in chains)

    monkeypatch.setenv("ART_TPU_SCAN_ENGINE", "off")
    kept_ref = amain.main(chains, sp, do, ao)
    # randomly misaligned chains are astigmatic: the spot-vs-distance valley
    # is flat over ~mm, so allow the distance a little slack
    for d_f, d_r in zip(kept["Detector"], kept_ref["Detector"]):
        assert d_f.get_distance() == pytest.approx(d_r.get_distance(), abs=1.0)
    np.testing.assert_allclose(kept["ETransmission"], kept_ref["ETransmission"],
                               rtol=0.02)
    np.testing.assert_allclose(kept["SpotSizeSD"], kept_ref["SpotSizeSD"],
                               rtol=0.1, atol=5e-4)
