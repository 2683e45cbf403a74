"""Single toroidal mirror in 2f-2f config with a roll-misalignment scan
(port of CONFIG_toroidal2f-2f.py)."""
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

Description = "single toroidal or ellipsoidal in 2f-2f config, possibly misaligned"
Support = msupp.SupportRectangle(300, 50)
Focal, MirrorIncidence = 500, 80
OptimalMajorRadius, OptimalMinorRadius = mmirror.ReturnOptimalToroidalRadii(Focal, MirrorIncidence)
Mirror = mmirror.MirrorToroidal(OptimalMajorRadius, OptimalMinorRadius, Support)

AlignedOpticalChain = mp.OEPlacement(SourceProperties, [Mirror], [2*Focal], [MirrorIncidence], Description=Description)

# roll-scan: a list of optical chains, each with a different roll of OE 0
OpticalChainList = AlignedOpticalChain.get_OE_loop_list(0, "roll", np.linspace(-0.5, 0.5, 11))

DetectorOptions = {
    'ReflectionNumber': -1,
    'ManualDetector': False,
    'DistanceDetector': 2*Focal,
    'AutoDetectorDistance': False,
    'OptFor': "intensity",
}

AnalysisOptions = {
    'verbose': False,
    'plot_Render': False,
    'DrawAiryAndFourier': True,
    'save_results': False,
}

if __name__ == "__main__":
    from attosecondraytracing_tpu.main import main
    kept_data = main(OpticalChainList, SourceProperties, DetectorOptions, AnalysisOptions)
