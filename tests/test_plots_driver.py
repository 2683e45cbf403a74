"""Smoke tests for the plot set (headless Agg) and the driver pipeline."""

import matplotlib

matplotlib.use("Agg", force=True)

import numpy as np
import matplotlib.pyplot as plt

from attosecondraytracing_tpu.analysis import plots
from attosecondraytracing_tpu.main import complete_defaults, main, run_ART, setup_detector
from attosecondraytracing_tpu.models import mirrors as mmirror
from attosecondraytracing_tpu.models import supports as msupp
from attosecondraytracing_tpu.models.placement import OEPlacement


def _chain(n=150):
    parabola = mmirror.MirrorParabolic(100, 90, msupp.SupportRoundHole(30, 5, 10, 5))
    props = {"Divergence": 0, "SourceSize": 40, "Wavelength": 800e-6, "DeltaFT": 2.7, "NumberRays": n}
    return OEPlacement(props, [parabola], [200], [0.0])


def test_all_plot_kinds_render():
    chain = _chain()
    bundle = chain.get_output_rays()[-1]
    det = setup_detector(chain, {**_det_opts(), "DistanceDetector": 100}, bundle)
    figs = [
        plots.SpotDiagram(bundle, det, DrawAiryAndFourier=True),
        plots.SpotDiagram(bundle, det, DrawAiryAndFourier=True, ColorCoded="Delay"),
        plots.SpotDiagram(bundle, det, ColorCoded="Intensity"),
        plots.DelayGraph(bundle, det, 2.7, DrawAiryAndFourier=True),
        plots.DelayGraph(bundle, det, 2.7, ColorCoded="Incidence"),
        plots.MirrorProjection(chain, -1, det, "Delay"),
        plots.MirrorProjection(chain, -1, None, "Incidence"),
        plots.RayRenderGraph(chain, maxRays=40, OEpoints=300),
        chain.quickshow(),
    ]
    for fig in figs:
        assert fig is not None
    plt.close("all")


def test_spot_diagram_key_navigation():
    chain = _chain()
    bundle = chain.get_output_rays()[-1]
    det = setup_detector(chain, {**_det_opts(), "DistanceDetector": 100}, bundle)
    fig = plots.SpotDiagram(bundle, det, DrawAiryAndFourier=True, ColorCoded="Delay")

    from matplotlib.backend_bases import KeyEvent

    # simulate the interactive detector shift (reference arrow-key handler)
    assert fig.canvas.callbacks.callbacks.get("key_press_event")
    for key in ["right", "right", "left", "up"]:
        KeyEvent("key_press_event", fig.canvas, key)._process()
    plt.close("all")


def _det_opts():
    return {
        "ReflectionNumber": -1,
        "ManualDetector": False,
        "DetectorCentre": None,
        "DetectorNormal": None,
        "DistanceDetector": None,
        "AutoDetectorDistance": False,
        "OptFor": "intensity",
    }


def test_driver_main_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    chain = _chain(100)
    source_props = {"Divergence": 0, "SourceSize": 40, "Wavelength": 800e-6, "DeltaFT": 2.7, "NumberRays": 100}
    det_opts = {"DistanceDetector": 100.0, "AutoDetectorDistance": True}
    analysis = {"verbose": False, "save_results": True}
    kept = main(chain, source_props, det_opts, analysis, save_file_name=str(tmp_path / "out"))
    assert len(kept["OpticalChain"]) == 1
    assert kept["ETransmission"][0] > 80
    assert kept["SpotSizeSD"][0] < 0.1
    assert (tmp_path / "out_0.xz").exists()


def test_driver_manual_detector():
    chain = _chain(80)
    bundle = chain.get_output_rays()[-1]
    import numpy as np

    centre = np.asarray(chain.optical_elements[0].position) + np.array([0, 0, -100.0])
    det = setup_detector(
        chain,
        {**_det_opts(), "ManualDetector": True, "DetectorCentre": centre, "DetectorNormal": np.array([0, 0, 1.0])},
    )
    assert det.centre is not None


def test_run_art_loop_variable_output(capsys):
    chain = _chain(60)
    chain.loop_variable_name = "test var"
    chain.loop_variable_value = 1.5
    sp, do, ao = complete_defaults(
        {"NumberRays": 60}, {"DistanceDetector": 100.0}, {"verbose": True, "save_results": False}
    )
    run_ART(chain, sp, do, ao, loop=True)
    out = capsys.readouterr().out
    assert "test var" in out and "energy transmission" in out


def test_batched_scan_fallback_is_visible(capsys):
    """A structurally-mixed chain list cannot be batch-traced; the driver must
    fall back to the serial path with a notice on stderr (not silently)."""
    from attosecondraytracing_tpu.main import _batched_final_bundles
    from attosecondraytracing_tpu.models import masks as mmask
    from attosecondraytracing_tpu.models import supports as msupp
    from attosecondraytracing_tpu.models.placement import OEPlacement

    c1 = _chain(60)
    # same length but a Mask instead of a Mirror -> different element types
    mask = mmask.Mask(msupp.SupportRoundHole(20, 3, 0, 0))
    props = {"Divergence": 0, "SourceSize": 40, "Wavelength": 800e-6, "DeltaFT": 2.7, "NumberRays": 60}
    c2 = OEPlacement(props, [mask], [100.0], [0.0])
    out = _batched_final_bundles([c1, c2])
    err = capsys.readouterr().err
    assert out is None
    assert "falling back to the serial" in err


def test_draw_mesh_renders_triangulated_surface():
    """draw_mesh=True builds a triangulated surface (reference delaunay_2d
    mesh, ART/ModuleAnalysisAndPlots.py:529-561); the holed support must have
    no triangles spanning the hole."""
    from attosecondraytracing_tpu.analysis.plots import _element_mesh_lab
    from attosecondraytracing_tpu.ops import supports as sup

    chain = _chain()  # parabola with SupportRoundHole(30, 5, 10, 5)
    el = chain.optical_elements[0]
    pts, tris = _element_mesh_lab(el, 800)
    assert len(tris) > 100
    assert pts.shape[1] == 3
    # no triangle centroid lies inside the hole / outside the disk
    pts_local = np.asarray(el.type.get_grid3D(800))
    centre = el.type.get_centre()
    cx = pts_local[tris, 0].mean(axis=1) - centre[0]
    cy = pts_local[tris, 1].mean(axis=1) - centre[1]
    assert np.asarray(sup.include(el.type.support, cx, cy)).all()
    # full render path with the flag on (matplotlib fallback or pyvista)
    fig = plots.RayRenderGraph(chain, maxRays=20, OEpoints=500, draw_mesh=True)
    assert fig is not None
    plt.close("all")


def test_api_docs_generator(tmp_path, monkeypatch):
    """The API-doc generator renders every package module without errors and
    the committed docs/api/index.md is in sync with the module set."""
    import importlib.util
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    spec = importlib.util.spec_from_file_location(
        "gen_api_docs", os.path.join(root, "scripts", "gen_api_docs.py"))
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)

    monkeypatch.setattr(gen, "OUT_DIR", str(tmp_path / "api"))
    gen.main()
    produced = sorted(p.name for p in (tmp_path / "api").iterdir())
    assert "index.md" in produced
    assert "attosecondraytracing_tpu_ops_trace.md" in produced
    committed = sorted(os.listdir(os.path.join(root, "docs", "api")))
    assert produced == committed, "docs/api is stale: re-run scripts/gen_api_docs.py"
