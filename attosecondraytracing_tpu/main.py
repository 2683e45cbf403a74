"""Driver / CLI: run a CONFIG file end to end (ARTmain.py equivalent).

Usage::

    python -m attosecondraytracing_tpu.main examples/CONFIG_xxx.py

A CONFIG file is an executable Python module defining ``OpticalChain`` (or
``OpticalChainList``), ``SourceProperties``, ``DetectorOptions`` and
``AnalysisOptions`` — the same contract as the reference
(ARTmain.py:56-96, docs/src/content/Usage/usage.md). Config scripts may also
``from attosecondraytracing_tpu.main import main`` and call it directly.
"""

from __future__ import annotations

import importlib.util
import os
import sys

if os.environ.get("ART_TPU_PLATFORM"):
    # explicit platform override (e.g. ART_TPU_PLATFORM=cpu for quick local
    # runs); the axon TPU plugin ignores the plain JAX_PLATFORMS env var
    import jax

    jax.config.update("jax_platforms", os.environ["ART_TPU_PLATFORM"])

import numpy as np

from . import default_options as defaults
from .analysis import stats
from .analysis.optimizer import FindOptimalDistance
from .models.chain import OpticalChain
from .models.detector import Detector
from .ops.bundle import RayBundle
from .utils import log
from .utils.io import save_compressed


# True while run_config_file() drives a CONFIG from the CLI; mirrors the
# reference's `__name__ != "__main__"` plot gating (ARTmain.py:294-296)
_CLI_ACTIVE = False


def load_config(config):
    """Pull the 4 config variables off an imported config module
    (ARTmain.py:56-96)."""
    if hasattr(config, "OpticalChainList"):
        chains = config.OpticalChainList
    elif hasattr(config, "OpticalChain"):
        chains = config.OpticalChain
    else:
        raise ValueError(
            "Could not import an optical-chain-object or list thereof with the "
            "name OpticalChain or OpticalChainList."
        )
    source_props = getattr(config, "SourceProperties", {})
    detector_opts = getattr(config, "DetectorOptions", {})
    analysis_opts = getattr(config, "AnalysisOptions", {})
    return chains, source_props, detector_opts, analysis_opts


def complete_defaults(SourceProperties, DetectorOptions, AnalysisOptions):
    """Merge user dicts over the defaults (ARTmain.py:99-110)."""
    sp = defaults.default_source_properties()
    do = defaults.default_detector_options()
    ao = defaults.default_analysis_options()
    sp.update(SourceProperties or {})
    do.update(DetectorOptions or {})
    ao.update(AnalysisOptions or {})
    return sp, do, ao


def setup_detector(chain: OpticalChain, DetectorOptions: dict, bundle: RayBundle | None = None) -> Detector:
    """Manual or automatic detector placement (ARTmain.py:113-144)."""
    ref_element = chain.optical_elements[DetectorOptions["ReflectionNumber"]]
    if DetectorOptions["ManualDetector"]:
        if DetectorOptions["DetectorCentre"] is None or DetectorOptions["DetectorNormal"] is None:
            raise RuntimeError(
                'Manual detector placement needs "DetectorCentre" and "DetectorNormal" '
                'in the "DetectorOptions"-dictionary.'
            )
        return Detector(
            ref_element.position,
            DetectorOptions["DetectorCentre"],
            DetectorOptions["DetectorNormal"],
        )
    if DetectorOptions["DistanceDetector"] is None:
        raise RuntimeError(
            'Automatic detector placement needs "DistanceDetector" in the '
            '"DetectorOptions"-dictionary.'
        )
    if bundle is None:
        raise RuntimeError("Automatic detector placement needs the analyzed ray bundle.")
    det = Detector(ref_element.position)
    det.autoplace(bundle, DetectorOptions["DistanceDetector"])
    return det


def _subsample(bundle: RayBundle, max_rays: int, rng=None) -> RayBundle:
    """Randomly subsample alive rays for optimizer speed (ARTmain.py:168-171)."""
    alive = np.asarray(bundle.alive)
    idx = np.nonzero(alive)[0]
    if len(idx) > max_rays:
        rng = np.random if rng is None else rng
        idx = rng.choice(idx, max_rays, replace=False)
    return RayBundle(*[np.asarray(x)[idx] if np.ndim(x) else x for x in bundle])


def optimize_detector(
    bundle: RayBundle,
    detector: Detector,
    DetectorOptions: dict,
    verbose: bool = True,
    maxRaystoConsider: int = 1000,
    IntensityWeighted: bool = False,
    Amplitude=None,
    Precision: int = 3,
):
    """Shift the detector to the optimum of DetectorOptions['OptFor']
    (ARTmain.py:147-190)."""
    sub = _subsample(bundle, maxRaystoConsider)
    det, spot, duration = FindOptimalDistance(
        detector, sub, DetectorOptions["OptFor"], Amplitude, Precision, IntensityWeighted, verbose
    )
    if verbose:
        result = f"The optimal detector distance is {det.get_distance():.3f} mm, with"
        if IntensityWeighted:
            result += " intensity-weighted"
        if DetectorOptions["OptFor"] in ["intensity", "spotsize", "size"]:
            result += f" spatial std of {spot * 1e3:.3g} μm"
        if DetectorOptions["OptFor"] in ["intensity", "duration"]:
            result += f" temporal std of {duration:.3g} fs."
        print(result, flush=True)
    return det, spot, duration


def _fused_optimizer_available(chain: OpticalChain) -> bool:
    """True when the detector-distance optimization can run as fused
    trace->stats Pallas scans: the chain's source is in-kernel-synthesizable,
    the bundle is production-size, and either the chain already traced on a
    fused engine or it is Pallas-eligible (backend + no-grid-defects) — the
    latter covers batched scans whose bundles were produced by the vmapped
    XLA path (round-3 weak #1: those used to silently drop to the 1000-ray
    subsampled host optimizer)."""
    from .models.chain import PALLAS_MIN_RAYS

    if (chain.source_spec is None
            or chain.source_rays.n_rays < PALLAS_MIN_RAYS):
        return False
    if chain.last_trace_engine in ("pallas", "pallas-source", "xla-source"):
        return True
    if chain._pallas_eligible(chain.device_elements()):
        return True
    # grid-defect chains: the XLA fused-source moments engine covers them
    # (ops/xla_source.py) on any non-CPU backend
    import jax

    return jax.default_backend() != "cpu"


def optimize_detector_fused(chain: OpticalChain, detector: Detector,
                            DetectorOptions: dict, verbose: bool = True):
    """Detector-distance optimization through the fused source->trace->moments
    kernel (FindOptimalDistancePallas): ONE kernel pass over the full bundle
    yields every candidate distance's statistics as exact quadratics, the
    minimization runs on the host in float64 — no per-ray data ever reaches
    HBM or the host.

    Optional ``DetectorOptions`` knobs (same names as the host optimizer's
    keyword arguments) are forwarded: ``Amplitude`` (search window, mm),
    ``Precision`` (resolution 10^-(P+1)*Amplitude), ``IntensityWeighted``
    (False drops the Gaussian source weights from the kernel moments)."""
    from .analysis.optimizer import FindOptimalDistancePallas

    spec = chain.source_spec
    weighted = DetectorOptions.get("IntensityWeighted", True)
    elements = chain.device_elements()
    moments_fn = None
    use_xla = not chain._pallas_eligible(elements)
    if not use_xla:
        # cold-process warmup weighing: for a small one-shot optimization the
        # XLA moments engine finishes before the Mosaic warmup would
        import jax

        from .ops import warmup

        use_xla = (jax.default_backend() != "cpu" and not warmup.mosaic_warm()
                   and spec.n_rays < warmup.BREAKEVEN_RAYS)
    if use_xla:
        # grid-defect chains (and cold small runs): same one-pass moment
        # optimizer through the XLA fused-source engine
        from .ops.xla_source import make_xla_moments_fn

        moments_fn = make_xla_moments_fn(spec.baked(), elements, spec.n_rays)
    det, spot, duration = FindOptimalDistancePallas(
        spec.baked(),
        elements,
        spec.n_rays,
        detector,
        DetectorOptions["OptFor"],
        Amplitude=DetectorOptions.get("Amplitude"),
        Precision=DetectorOptions.get("Precision", 3),
        gaussian_edge=spec.gaussian_edge if weighted else None,
        verbose=False,
        moments_fn=moments_fn,
    )
    if verbose:
        result = f"The optimal detector distance is {det.get_distance():.3f} mm, with"
        if weighted:
            result += " intensity-weighted"
        if DetectorOptions["OptFor"] in ["intensity", "spotsize", "size"]:
            result += f" spatial std of {spot * 1e3:.3g} μm"
        if DetectorOptions["OptFor"] in ["intensity", "duration"]:
            result += f" temporal std of {duration:.3g} fs."
        print(result + " [fused kernel scan over all rays]", flush=True)
    return det, spot, duration


def get_result_summary(detector: Detector, bundle: RayBundle, verbose: bool = False):
    """(spot SD, duration SD) + optional printed summary
    (GetResultSummary, ART/ModuleAnalysisAndPlots.py:81-129)."""
    spot, duration = detector.get_SpotAndDuration(bundle)
    spot = float(spot)
    duration = float(duration)
    if verbose:
        alive = np.asarray(bundle.alive)
        xy = np.asarray(detector.get_PointList2DCentre(bundle))[alive]
        delays = np.asarray(detector.get_Delays(bundle))[alive]
        extent = max(np.ptp(xy[:, 0]), np.ptp(xy[:, 1])) if len(xy) else 0.0
        print(
            f"At the detector distance of {detector.get_distance():.3f} mm we get:\n"
            f"Spatial std : {spot * 1e3:.3f} μm and min-max: {extent * 1e3:.3f} μm\n"
            f"Temporal std : {duration:.3e} fs and min-max : {np.ptp(delays):.3e} fs"
        )
    return spot, duration


def make_plots(chain, bundle, detector, SourceProperties, DetectorOptions, AnalysisOptions):
    """Flag-gated standard plots (ARTmain.py:193-244)."""
    from .analysis import plots

    A = AnalysisOptions
    if A["plot_Render"]:
        plots.RayRenderGraph(
            chain,
            detector.get_distance() * 1.2,
            A["maxRaysToRender"],
            A["OEPointsToRender"],
            A["OEPointsScale"],
            draw_mesh=A["draw_mesh"],
            cycle_ray_colors=A["cycle_ray_colors"],
        )
    for which in ("Delay", "Intensity", "Incidence"):
        if A[f"plot_{which}MirrorProjection"]:
            plots.MirrorProjection(chain, DetectorOptions["ReflectionNumber"], detector, which)

    # device-binned images replace per-ray scatters for production bundles
    # (fetching 1e7+ rays to the host for a scatter plot is impractical);
    # "auto" switches on at the same threshold as the Pallas trace engine
    from .models.chain import PALLAS_MIN_RAYS

    use_images = A["image_plots"] is True or (
        A["image_plots"] == "auto" and bundle.n_rays >= PALLAS_MIN_RAYS
    )
    bins = int(A["image_bins"])

    # image_rays: render the intensity/delay images from that many in-kernel
    # synthesized rays (chunked fused-source kernel + device binning) —
    # detector images beyond any traceable bundle size. Supersedes ONLY the
    # per-bundle intensity/delay spot plots; incidence plots (which the
    # giga-ray panels don't carry) still render from the traced bundle.
    image_rays = A.get("image_rays")
    giga_done = False
    want_giga = A["plot_SpotDiagram"] or any(
        A[f"plot_{w}SpotDiagram"] or A[f"plot_{w}Graph"]
        for w in ("Delay", "Intensity")
    )
    if image_rays and want_giga:
        if chain.source_spec is None:
            print(
                "[attosecondraytracing_tpu] image_rays ignored: this chain's "
                "source is not in-kernel synthesizable (no source_spec).",
                flush=True,
            )
        else:
            from .analysis.gigascan import fused_source_images

            res = fused_source_images(
                chain.source_spec, chain.device_elements(), detector,
                n_total=int(image_rays), bins=(bins, bins),
            )
            plots.GigaRayImages(res, title=chain.description)
            giga_done = True

    if A["plot_SpotDiagram"] and not giga_done:
        if use_images:
            plots.SpotDiagramImage(bundle, detector, A["DrawAiryAndFourier"], bins=bins)
        else:
            plots.SpotDiagram(bundle, detector, A["DrawAiryAndFourier"])
    for which in ("Delay", "Intensity", "Incidence"):
        if A[f"plot_{which}SpotDiagram"] and not (giga_done and which != "Incidence"):
            if use_images:
                plots.SpotDiagramImage(bundle, detector, A["DrawAiryAndFourier"], which, bins=bins)
            else:
                plots.SpotDiagram(bundle, detector, A["DrawAiryAndFourier"], which)
    for which in ("Delay", "Intensity", "Incidence"):
        if A[f"plot_{which}Graph"] and not (giga_done and which != "Incidence"):
            if use_images:
                plots.DelayMapImage(
                    bundle, detector, SourceProperties["DeltaFT"], A["DrawAiryAndFourier"],
                    None if which == "Delay" else which, bins=bins,
                )
            else:
                plots.DelayGraph(
                    bundle, detector, SourceProperties["DeltaFT"], A["DrawAiryAndFourier"],
                    None if which == "Delay" else which,
                )


def _prepare_fused_scan(chains, DetectorOptions, AnalysisOptions):
    """Eligibility + shared static spec for the runtime-scalar fused scan
    engine (ops/pallas_scan.py): every chain must carry an in-kernel
    synthesizable source of the same size and share the pose-independent
    element structure; per-chain plots (which need full bundles) must not be
    requested. Returns {'spec', 'elements': per-chain element lists} or None.
    Set ART_TPU_SCAN_ENGINE=off to force the legacy per-chain path."""
    if os.environ.get("ART_TPU_SCAN_ENGINE", "auto") == "off":
        return None
    from .models.chain import PALLAS_MIN_RAYS

    if len(chains) < 2:
        return None
    specs = [c.source_spec for c in chains]
    if any(s is None or s.kind not in ("cone", "disk", "extended", "square") for s in specs):
        return None
    n_rays = specs[0].n_rays
    if any(s.n_rays != n_rays or s.kind != specs[0].kind for s in specs):
        return None
    if n_rays < PALLAS_MIN_RAYS:
        return None
    # per-chain plots need per-ray bundles; the CLI scan loop skips plots
    # anyway (reference gating), so only library-mode plot requests bail
    plots_wanted = any(
        AnalysisOptions.get(k) for k in AnalysisOptions if k.startswith("plot_")
    )
    if plots_wanted and not _CLI_ACTIVE:
        return None
    element_lists = [c.device_elements() for c in chains]
    forced = os.environ.get("ART_TPU_SCAN_ENGINE", "auto")
    from .ops.pallas_scan import make_scan_spec, pose_independent_signature

    pallas_ok = False
    if forced in ("auto", "pallas"):
        try:
            sigs = {pose_independent_signature(els) for els in element_lists}
            pallas_ok = (len(sigs) == 1
                         and chains[0]._pallas_eligible(element_lists[0]))
        except NotImplementedError:
            pallas_ok = False  # grid defects: not bakeable into the kernel
    if pallas_ok and forced == "auto":
        # cold-process warmup weighing: a modest scan's total fused work may
        # not cover the one-time Mosaic warmup — the XLA fused-source scan
        # engine (compiles in seconds) serves it instead
        import jax

        from .ops import warmup

        if (jax.default_backend() != "cpu" and not warmup.mosaic_warm()
                and len(chains) * n_rays < warmup.BREAKEVEN_RAYS):
            pallas_ok = False
    if pallas_ok:
        baked0 = specs[0].baked()
        spec = make_scan_spec(specs[0].kind, element_lists[0], n_rays,
                              n_each=baked0.n_each,
                              n_sources=baked0.n_sources)
        return {"engine": "pallas-scan", "spec": spec, "elements": element_lists}
    # grid-defect (or otherwise kernel-ineligible) scans: the XLA
    # fused-source moments engine takes poses as traced inputs, so it also
    # shares one executable across same-structure chains
    import jax

    if forced not in ("auto", "xla"):
        return None
    if forced == "auto" and jax.default_backend() == "cpu":
        return None
    treedefs = {jax.tree_util.tree_structure(els) for els in element_lists}
    shapes = {
        tuple(np.asarray(leaf).shape for leaf in jax.tree_util.tree_leaves(els))
        for els in element_lists
    }
    if len(treedefs) != 1 or len(shapes) != 1:
        return None
    return {"engine": "xla-scan", "spec": None, "elements": element_lists}


def _run_ART_fused_scan(chain, elements, scan_spec, DetectorOptions,
                        AnalysisOptions, engine="pallas-scan"):
    """One scan chain through the fused scan engine: probe trace for
    detector placement, shared-kernel moments for transmission + statistics
    + the fused detector optimizer. No full bundle is ever built (replaces
    the serial re-trace of ART/ARTmain.py:326-332). ``engine``:
    "pallas-scan" (runtime-scalar Mosaic kernel) or "xla-scan" (XLA
    fused-source engine — grid-defect chains)."""
    from .analysis.optimizer import FindOptimalDistancePallas
    from .ops import pallas_scan as ps
    from .ops import pallas_trace as pt
    from .ops.trace import trace_jit

    niceline = "_" * 99 + "\n"
    info = chain.source_spec
    baked_src = info.baked()
    probe = pt.source_bundle(baked_src, min(info.n_rays, 8192),
                             wavelength=info.wavelength)
    probe_out = trace_jit(probe, elements, keep_history=False)
    detector = setup_detector(chain, DetectorOptions, probe_out)

    if engine == "xla-scan":
        from .ops.xla_source import make_xla_moments_fn

        fn = make_xla_moments_fn(baked_src, elements, info.n_rays)
    else:
        fn = ps.make_moments_fn(scan_spec, elements, info, info.n_rays)
    weighted = DetectorOptions.get("IntensityWeighted", True)
    edge = info.gaussian_edge if weighted else None
    rec = {}
    if DetectorOptions["AutoDetectorDistance"]:
        detector, spot_sd, duration_sd = FindOptimalDistancePallas(
            baked_src, elements, info.n_rays, detector,
            DetectorOptions["OptFor"],
            Amplitude=DetectorOptions.get("Amplitude"),
            Precision=DetectorOptions.get("Precision", 3),
            gaussian_edge=edge, moments_fn=fn, last_moments=rec,
        )
    else:
        rec = fn(detector.centre, detector.normal,
                 detector._plane_rotation(), gaussian_edge=edge)
        sums = pt.moments_to_distance_sums(rec["moments"], (0.0,),
                                           rec["centre_distance"])
        res = pt.sums_to_stats(sums, rec["opl_ref"], (0.0,))
        spot_sd, duration_sd = float(res["spot_sd"][0]), float(res["duration_sd"][0])

    # transmission numerator: surviving INTENSITY weight. Reuse the
    # optimizer's moments when they carry the source profile; re-evaluate
    # once if the optimizer ran unweighted
    if edge == info.gaussian_edge:
        sum_w = float(rec["moments"][0])
    else:
        rec_t = fn(detector.centre, detector.normal,
                   detector._plane_rotation(), gaussian_edge=info.gaussian_edge)
        sum_w = float(rec_t["moments"][0])
    etransmission = 100.0 * sum_w / ps.total_source_weight(
        info.n_rays, info.gaussian_edge, n_each=baked_src.n_each,
        n_sources=baked_src.n_sources, kind=baked_src.kind)
    chain.last_trace_engine = engine

    if AnalysisOptions["verbose"]:
        print(niceline[:-1], flush=True)
        if isinstance(chain.description, str) and chain.description:
            print("***" + chain.description + "*** :")
        if chain.loop_variable_name is not None and chain.loop_variable_value is not None:
            print(f"For {chain.loop_variable_name} = {chain.loop_variable_value:f}:\n")
        print(f"The optical setup has an energy transmission of {etransmission:.1f}%.\n")
        if DetectorOptions["AutoDetectorDistance"]:
            result = f"The optimal detector distance is {detector.get_distance():.3f} mm, with"
            if weighted:
                result += " intensity-weighted"
            if DetectorOptions["OptFor"] in ["intensity", "spotsize", "size"]:
                result += f" spatial std of {spot_sd * 1e3:.3g} μm"
            if DetectorOptions["OptFor"] in ["intensity", "duration"]:
                result += f" temporal std of {duration_sd:.3g} fs."
            print(result + " [fused scan kernel over all rays]", flush=True)
        else:
            print(
                f"At the detector distance of {detector.get_distance():.3f} mm "
                f"we get:\nSpatial std : {spot_sd * 1e3:.3f} μm\n"
                f"Temporal std : {duration_sd:.3e} fs  "
                f"[fused scan kernel over all rays]"
            )
        print(niceline)
    return chain, detector, etransmission, spot_sd, duration_sd


def run_ART(
    chain: OpticalChain,
    SourceProperties,
    DetectorOptions,
    AnalysisOptions,
    loop=False,
    precomputed_bundle: RayBundle | None = None,
):
    """Trace one chain, set up / optimize its detector, summarize, plot
    (ARTmain.py:248-300). ``precomputed_bundle`` short-circuits the trace when
    the scan was evaluated batched (see :func:`_batched_final_bundles`)."""
    niceline = "_" * 99 + "\n"
    if precomputed_bundle is not None:
        bundle = precomputed_bundle
    else:
        A = AnalysisOptions
        needs_history = A["plot_Render"] or any(
            A[f"plot_{w}MirrorProjection"] for w in ("Delay", "Intensity", "Incidence")
        )
        is_final = DetectorOptions["ReflectionNumber"] in (-1, len(chain.optical_elements) - 1)
        if is_final and not needs_history:
            # production path: history-free trace through the engine
            # auto-selector (fused Pallas kernels for big bundles on TPU,
            # XLA otherwise; see OpticalChain.trace_final)
            bundle = chain.trace_final()
            if AnalysisOptions["verbose"] and chain.last_trace_engine != "xla":
                print(f"[trace engine: {chain.last_trace_engine}]", flush=True)
        else:
            output_rays = chain.get_output_rays()
            bundle = output_rays[DetectorOptions["ReflectionNumber"]]

    etransmission = float(stats.energy_transmission(chain.source_rays, bundle))
    if AnalysisOptions["verbose"]:
        print(niceline[:-1], flush=True)
        if isinstance(chain.description, str) and chain.description:
            print("***" + chain.description + "*** :")
        if chain.loop_variable_name is not None and chain.loop_variable_value is not None:
            print(f"For {chain.loop_variable_name} = {chain.loop_variable_value:f}:\n")
        print(f"The optical setup has an energy transmission of {etransmission:.1f}%.\n")

    detector = setup_detector(chain, DetectorOptions, bundle)

    if DetectorOptions["AutoDetectorDistance"]:
        fused_ok = _fused_optimizer_available(chain)
        if fused_ok:
            # fused trace->stats scan: every refinement level is one kernel
            # pass over ALL rays (the reference caps the optimizer at 1000
            # sampled rays for speed, ARTmain.py:168-171 — unnecessary here)
            try:
                detector, spot_sd, duration_sd = optimize_detector_fused(
                    chain, detector, DetectorOptions, AnalysisOptions["verbose"]
                )
            except (NotImplementedError, ValueError, RuntimeError) as exc:
                # only the expected capability errors degrade to the host
                # optimizer (kernel can't take this chain / backend refuses);
                # genuine programming errors must propagate, not silently
                # return coarser optima (ADVICE r4)
                print(
                    f"[attosecondraytracing_tpu] fused detector optimizer "
                    f"unavailable ({type(exc).__name__}: {exc}); using the "
                    f"subsampled host optimizer.",
                    file=sys.stderr,
                    flush=True,
                )
                fused_ok = False
        if not fused_ok:
            detector, spot_sd, duration_sd = optimize_detector(
                bundle,
                detector,
                DetectorOptions,
                AnalysisOptions["verbose"],
                maxRaystoConsider=DetectorOptions.get("maxRaystoConsider", 1000),
                IntensityWeighted=DetectorOptions.get("IntensityWeighted", True),
                Amplitude=DetectorOptions.get("Amplitude"),
                Precision=DetectorOptions.get("Precision", 3),
            )
    else:
        spot_sd, duration_sd = get_result_summary(detector, bundle, AnalysisOptions["verbose"])

    if AnalysisOptions["verbose"]:
        print(niceline)

    # reference gating (ARTmain.py:294-296): scan-loop runs plot only when
    # main() is invoked as a library (not via the CLI), where the caller
    # presumably wants every iteration's figures
    if not loop or not _CLI_ACTIVE:
        plot_keys = [k for k in AnalysisOptions if k.startswith("plot_")]
        if any(AnalysisOptions[k] for k in plot_keys):
            make_plots(chain, bundle, detector, SourceProperties, DetectorOptions, AnalysisOptions)

    return chain, detector, etransmission, spot_sd, duration_sd


def main(OpticalChainList, SourceProperties, DetectorOptions, AnalysisOptions, save_file_name=None):
    """Loop over the chain(s), keep the results, optionally save
    (ARTmain.py:304-342)."""
    SourceProperties, DetectorOptions, AnalysisOptions = complete_defaults(
        SourceProperties, DetectorOptions, AnalysisOptions
    )

    keeper_names = ["OpticalChain", "Detector", "ETransmission", "SpotSizeSD", "DurationSD"]
    kept_data = {name: [] for name in keeper_names}

    if isinstance(OpticalChainList, OpticalChain):
        OpticalChainList = [OpticalChainList]
        loop = False
    elif not isinstance(OpticalChainList, list):
        raise ValueError(
            "The supplied OpticalChain is neither an OpticalChain-object, nor a list of those."
        )
    else:
        loop = True

    # TPU-native fast paths for parameter scans (replace the reference's
    # serial loop, ARTmain.py:326-332) when only the final bundle is analyzed:
    # 1. the runtime-scalar fused kernel — every chain through ONE compiled
    #    Mosaic kernel, no per-ray data ever materialized (production sizes);
    # 2. otherwise one vmapped XLA trace over stacked bundles (small scans).
    scan_ctx = None
    bundles = None
    if loop and DetectorOptions["ReflectionNumber"] in (-1, len(OpticalChainList[0].optical_elements) - 1):
        scan_ctx = _prepare_fused_scan(OpticalChainList, DetectorOptions, AnalysisOptions)
        if scan_ctx is None:
            bundles = _batched_final_bundles(OpticalChainList)

    for i, chain in enumerate(OpticalChainList):
        print(f"Optical Chain {i}/{len(OpticalChainList)} ", end="", flush=True)
        if scan_ctx is not None:
            values = _run_ART_fused_scan(
                chain, scan_ctx["elements"][i], scan_ctx["spec"],
                DetectorOptions, AnalysisOptions, engine=scan_ctx["engine"],
            )
        else:
            values = run_ART(
                chain, SourceProperties, DetectorOptions, AnalysisOptions, loop,
                precomputed_bundle=None if bundles is None else bundles[i],
            )
        for name, value in zip(keeper_names, values):
            kept_data[name].append(value)

    if AnalysisOptions["save_results"]:
        log.transient("...saving data...")
        save_compressed(kept_data, save_file_name)
        log.clear_line()

    return kept_data


def _batched_final_bundles(chains):
    """Evaluate a structurally-uniform chain scan as ONE vmapped device trace;
    returns per-chain final bundles, or None if the scan cannot be batched.

    Memory guard (round-3 weak #1): stacking every chain's source bundle on
    the host costs ~37 B/ray/chain — a production-size scan that somehow
    missed the fused engine must not silently allocate gigabytes here."""
    import jax

    from .parallel.mesh import stack_chains, trace_scan

    est_bytes = len(chains) * sum(
        np.asarray(leaf).nbytes for leaf in chains[0].source_rays
    )
    limit = float(os.environ.get("ART_TPU_SCAN_STACK_MAX_BYTES", 1e9))
    if est_bytes > limit:
        print(
            f"[attosecondraytracing_tpu] batched scan skipped: stacking "
            f"{len(chains)} source bundles would allocate ~{est_bytes / 1e9:.1f} GB "
            f"(limit {limit / 1e9:.1f} GB, ART_TPU_SCAN_STACK_MAX_BYTES); "
            f"tracing serially.",
            file=sys.stderr,
            flush=True,
        )
        return None
    try:
        stacked_elements, stacked_sources = stack_chains(chains)
        outs = trace_scan(stacked_sources, stacked_elements)
    except Exception as exc:  # structurally-mixed scans etc. fall back to serial
        print(
            f"[attosecondraytracing_tpu] batched scan unavailable "
            f"({type(exc).__name__}: {exc}); falling back to the serial per-chain trace.",
            file=sys.stderr,
            flush=True,
        )
        return None
    return [jax.tree.map(lambda x, i=i: x[i], outs) for i in range(len(chains))]


def run_config_file(path: str, n_rays: int | None = None):
    """Execute a CONFIG file and run main() on its contents (CLI path,
    ARTmain.py:346-382). ``n_rays`` overrides the config's ray count by
    regenerating each chain's source at that size (CLI ``--rays``)."""
    global _CLI_ACTIVE
    log.print_banner()
    filename = os.path.basename(path)
    spec = importlib.util.spec_from_file_location(filename, path)
    config_module = importlib.util.module_from_spec(spec)
    sys.modules[filename] = config_module
    _CLI_ACTIVE = True
    try:
        spec.loader.exec_module(config_module)
        chains, sp, do, ao = load_config(config_module)
        if n_rays is not None:
            sp = dict(sp, NumberRays=int(n_rays))
            for chain in chains if isinstance(chains, list) else [chains]:
                try:
                    chain.resize_source(int(n_rays))
                except ValueError as exc:
                    print(f"[attosecondraytracing_tpu] --rays ignored for "
                          f"'{chain.description}': {exc}", flush=True)
        return main(chains, sp, do, ao, save_file_name=os.path.splitext(path)[0])
    finally:
        _CLI_ACTIVE = False


def cli(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    profile_dir = None
    if "--profile" in argv:
        # capture a jax.profiler trace of the whole run (view with
        # TensorBoard/xprof); replaces the reference's commented-out _tic/_toc
        # timers (ARTmain.py:251,288) with real device-level profiling
        i = argv.index("--profile")
        try:
            profile_dir = argv[i + 1]
        except IndexError:
            print("--profile requires a trace output directory")
            sys.exit(1)
        del argv[i : i + 2]
    n_rays = None
    if "--rays" in argv:
        # production-scale any config without editing it: regenerate each
        # chain's source at this count (needs a factory Vogel source)
        i = argv.index("--rays")
        try:
            n_rays = int(float(argv[i + 1]))
        except (IndexError, ValueError):
            print("--rays requires a ray count (e.g. --rays 1e7)")
            sys.exit(1)
        del argv[i : i + 2]
    if len(argv) < 1:
        print("Usage: python -m attosecondraytracing_tpu.main "
              "[--profile DIR] [--rays N] CONFIG_FILE")
        sys.exit(1)
    with log.jax_profile(profile_dir):
        run_config_file(argv[0], n_rays=n_rays)


if __name__ == "__main__":
    cli()
