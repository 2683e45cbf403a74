"""Collimating telescope (CX + CC spherical mirrors) + off-axis parabola
(port of CONFIG_CollimatingTelescope.py)."""
import numpy as np
from attosecondraytracing_tpu import mirrors as mmirror
from attosecondraytracing_tpu import supports as msupp
from attosecondraytracing_tpu import processing as mp

SourceProperties = {
    'Divergence': 2.2e-3,
    'SourceSize': 0,
    'Wavelength': 780e-6,
    'DeltaFT': 1.3,
    'NumberRays': 1000,
}

Description = " Collimating telescope + off-axis parabola "
MirrorCX = mmirror.MirrorSpherical(-1500, msupp.SupportRound(25))
MirrorCC = mmirror.MirrorSpherical(2500, msupp.SupportRound(25))
FocalEffective = 100
Parabola = mmirror.MirrorParabolic(FocalEffective, 90, msupp.SupportRound(25))

OpticsList = [MirrorCX, MirrorCC, Parabola]
DistanceList = [5000, 598, 1000]
IncidenceAngleList = [5, 3.4, 0.04]

OpticalChainList = mp.OEPlacement(SourceProperties, OpticsList, DistanceList,
                                  IncidenceAngleList, Description=Description)

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
    'DrawAiryAndFourier': True,
    'plot_DelaySpotDiagram': True,
    'save_results': False,
}

if __name__ == "__main__":
    from attosecondraytracing_tpu.main import main
    kept_data = main(OpticalChainList, SourceProperties, DetectorOptions, AnalysisOptions)
