"""Monte-Carlo tolerancing: all elements randomly rotated/shifted, statistics
of the resulting focus metrics (reference pattern: get_OE_random_loop_list,
ART/ModuleOpticalChain.py:616-657 — here the scan is traced as ONE vmapped
device call by the driver's batched fast path)."""
import numpy as np
from attosecondraytracing_tpu import mirrors as mmirror
from attosecondraytracing_tpu import supports as msupp
from attosecondraytracing_tpu import processing as mp

SourceProperties = {
    'Divergence': 30e-3/2,
    'SourceSize': 0,
    'Wavelength': 50e-6,
    'DeltaFT': 0.5,
    'NumberRays': 1000,
}

Description = "toroidal 2f-2f with Monte-Carlo alignment tolerances"
Focal, MirrorIncidence = 500, 80
R, r = mmirror.ReturnOptimalToroidalRadii(Focal, MirrorIncidence)
Mirror = mmirror.MirrorToroidal(R, r, msupp.SupportRectangle(300, 50))

Aligned = mp.OEPlacement(SourceProperties, [Mirror], [2*Focal], [MirrorIncidence], Description=Description)
OpticalChainList = Aligned.get_OE_random_loop_list(rotate_std=0.01, shift_std=0.2,
                                                   number_sims=16, rng=np.random.default_rng(7))

DetectorOptions = {
    'ReflectionNumber': -1,
    'ManualDetector': False,
    'DistanceDetector': 2*Focal,
    'AutoDetectorDistance': False,
    'OptFor': "intensity",
}

AnalysisOptions = {'verbose': False, 'save_results': False}

if __name__ == "__main__":
    from attosecondraytracing_tpu.main import main
    kept = main(OpticalChainList, SourceProperties, DetectorOptions, AnalysisOptions)
    spots = np.array(kept["SpotSizeSD"]) * 1e3
    print(f"Monte-Carlo spot SD over {len(spots)} sims: "
          f"median {np.median(spots):.1f} um, p90 {np.percentile(spots, 90):.1f} um")
