"""Template CONFIG: build an OpticalChain (or a list) plus the three option
dictionaries; run with  python -m attosecondraytracing_tpu.main CONFIG__template.py
(port of the reference's examples/CONFIG__template.py)."""
import numpy as np
from attosecondraytracing_tpu import mirrors as mmirror
from attosecondraytracing_tpu import masks as mmask
from attosecondraytracing_tpu import supports as msupp
from attosecondraytracing_tpu import processing as mp

SourceProperties = {
    'Divergence': 30e-3/2,  # half-angle in rad, 0 for a plane wave
    'SourceSize': 0,        # diameter in mm, 0 for a point source
    'Wavelength': 50e-6,    # in mm
    'DeltaFT': 0.5,         # in fs
    'NumberRays': 1000,
}

Description = "template: one toroidal mirror refocusing a point source 2f-2f"
Focal, AngleIncidence = 500, 80
R, r = mmirror.ReturnOptimalToroidalRadii(Focal, AngleIncidence)
Mirror = mmirror.MirrorToroidal(R, r, msupp.SupportRectangle(300, 50))
OpticalChain = mp.OEPlacement(SourceProperties, [Mirror], [2*Focal], [AngleIncidence], Description=Description)

DetectorOptions = {
    'ReflectionNumber': -1,
    'ManualDetector': False,
    'DistanceDetector': 2*Focal,
    'AutoDetectorDistance': False,
    'OptFor': "intensity",
}

AnalysisOptions = {
    'verbose': True,
    'plot_Render': False,
    'DrawAiryAndFourier': True,
    'plot_SpotDiagram': False,
    'plot_DelaySpotDiagram': False,
    'plot_IntensitySpotDiagram': False,
    'plot_IncidenceSpotDiagram': False,
    'plot_DelayGraph': False,
    'plot_IntensityGraph': False,
    'plot_IncidenceGraph': False,
    'plot_DelayMirrorProjection': False,
    'plot_IntensityMirrorProjection': False,
    'plot_IncidenceMirrorProjection': False,
    'save_results': False,
}

if __name__ == "__main__":
    from attosecondraytracing_tpu.main import main
    kept_data = main(OpticalChain, SourceProperties, DetectorOptions, AnalysisOptions)
