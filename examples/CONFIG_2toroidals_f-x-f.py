"""Mask + two toroidal mirrors in f-d-f config (approx. collimation,
propagation, refocus) with a distance scan (port of CONFIG_2toroidals_f-x-f.py,
which passed a stale extra 'render' argument to OEPlacement — fixed here)."""
import numpy as np
from attosecondraytracing_tpu import mirrors as mmirror
from attosecondraytracing_tpu import masks as mmask
from attosecondraytracing_tpu import supports as msupp
from attosecondraytracing_tpu import processing as mp

SourceProperties = {
    'Divergence': 50e-3/2,
    'SourceSize': 0,
    'Wavelength': 80e-6,
    'DeltaFT': 0.5,
    'NumberRays': 1000,
}

Description = ("2 toroidal mirrors in f-d-f config, i.e. approx. collimation, "
               "propagation, and the refocus")
Support = msupp.SupportRectangle(150, 32)
Focal, AngleIncidence = 500, 80
OptimalMajorRadius, OptimalMinorRadius = mmirror.ReturnOptimalToroidalRadii(Focal, AngleIncidence)
ToroidalMirror = mmirror.MirrorToroidal(OptimalMajorRadius, OptimalMinorRadius, Support)
Mask = mmask.Mask(msupp.SupportRoundHole(Radius=20, RadiusHole=14/2, CenterHoleX=0, CenterHoleY=0))

OpticsList = [Mask, ToroidalMirror, ToroidalMirror]
IncidenceAngleList = [0, AngleIncidence, -AngleIncidence]
IncidencePlaneAngleList = [0, 0, 0]
DistanceList = [400, Focal-400, np.linspace(Focal-200, Focal+200, 11)]

OpticalChainList = mp.OEPlacement(SourceProperties, OpticsList, DistanceList,
                                  IncidenceAngleList, IncidencePlaneAngleList, Description)

DetectorOptions = {
    'ReflectionNumber': -1,
    'ManualDetector': False,
    'DistanceDetector': Focal,
    'AutoDetectorDistance': True,
    'OptFor': "intensity",
}

AnalysisOptions = {
    'verbose': True,
    'plot_Render': False,
    'DrawAiryAndFourier': True,
    'save_results': False,
}

if __name__ == "__main__":
    from attosecondraytracing_tpu.main import main
    kept_data = main(OpticalChainList, SourceProperties, DetectorOptions, AnalysisOptions)
