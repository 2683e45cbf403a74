"""A 90 deg off-axis parabola with a holed support, illuminated by a plane
wave, with a small roll misalignment (port of CONFIG_singleparabola.py)."""
import numpy as np
from attosecondraytracing_tpu import mirrors as mmirror
from attosecondraytracing_tpu import supports as msupp
from attosecondraytracing_tpu import processing as mp

SourceProperties = {
    'Divergence': 0,      # plane wave
    'SourceSize': 50,     # beam diameter in mm
    'Wavelength': 800e-6, # 800 nm
    'DeltaFT': 2.7,
    'NumberRays': 1000,
}

Description = "A 90° off-axis parabola with a hole, illuminated by a plane wave."
Support = msupp.SupportRoundHole(30, 5, 10, 5)
FocalEffective = 100  # mm
Parabola = mmirror.MirrorParabolic(FocalEffective, 90, Support)

OpticalChainList = mp.OEPlacement(SourceProperties, [Parabola], [200], [0.00], Description=Description)

# mis-align the parabola slightly out of the incidence plane (roll)
ParabolaOE = OpticalChainList.optical_elements[0]
ParabolaOE.rotate_roll_by(np.rad2deg(50e-6))

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
