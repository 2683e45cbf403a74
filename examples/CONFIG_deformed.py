"""On-axis parabola with a synthesized Fourier-PSD surface defect
(port of CONFIG_deformed.py)."""
import numpy as np
from attosecondraytracing_tpu import mirrors as mmirror
from attosecondraytracing_tpu import supports as msupp
from attosecondraytracing_tpu import defects as mdef
from attosecondraytracing_tpu import processing as mp

SourceProperties = {
    'Divergence': 0,
    'SourceSize': 100,
    'Wavelength': 800e-6,
    'DeltaFT': 0,
    'NumberRays': 1000,
}

Description = "deformed on-axis parabola"
Support = msupp.SupportRectangle(40, 40)
FocalEffective = 25.4
Mirror = mmirror.MirrorParabolic(FocalEffective, 0, Support)
Defect = mdef.Fourrier(Support, RMS=1e-1, smallest=0.01, seed=12345)
DeformedMirror = mmirror.DeformedMirror(Mirror, [Defect])

OpticalChainList = mp.OEPlacement(SourceProperties, [DeformedMirror], [15], [0], Description=Description)

DetectorOptions = {
    'ReflectionNumber': -1,
    'ManualDetector': False,
    'DistanceDetector': FocalEffective,
    'AutoDetectorDistance': False,
    'OptFor': "intensity",
}

AnalysisOptions = {
    'verbose': True,
    'plot_Render': False,
    'DrawAiryAndFourier': False,
    'save_results': False,
}

if __name__ == "__main__":
    from attosecondraytracing_tpu.main import main
    kept_data = main(OpticalChainList, SourceProperties, DetectorOptions, AnalysisOptions)
