"""Mask + two toroidals in f-D-f config, with the 2nd toroidal rotating the
incidence plane (scan over the incidence-plane angle; port of
CONFIG_2toroidals_twisted.py, stale 'render' argument dropped)."""
import numpy as np
from attosecondraytracing_tpu import mirrors as mmirror
from attosecondraytracing_tpu import masks as mmask
from attosecondraytracing_tpu import supports as msupp
from attosecondraytracing_tpu import processing as mp

SourceProperties = {
    'Divergence': 50e-3/2,
    'SourceSize': 0,
    'Wavelength': 50e-6,
    'DeltaFT': 0.5,
    'NumberRays': 1000,
}

Description = ('2 toroidal mirrors in f-D-f config, i.e. approx. collimation, propagation, '
               'and the refocus, with the 2nd toroidal rotating the plane of incidence.')
Mask = mmask.Mask(msupp.SupportRoundHole(30, 41e-3/2*500, 0, 0))
Support = msupp.SupportRectangle(200, 30)
FocalLength, ToroidalIncidence = 600, 80
OptimalMajorRadius, OptimalMinorRadius = mmirror.ReturnOptimalToroidalRadii(FocalLength, ToroidalIncidence)
ToroidalMirror = mmirror.MirrorToroidal(OptimalMajorRadius, OptimalMinorRadius, Support)

OpticsList = [Mask, ToroidalMirror, ToroidalMirror]
IncidenceAngleList = [0, ToroidalIncidence, -ToroidalIncidence]
DistanceList = [500, FocalLength-500, FocalLength]
IncidencePlaneAngleList = [0, 0, np.linspace(-90, 90, 10)]

OpticalChainList = mp.OEPlacement(SourceProperties, OpticsList, DistanceList,
                                  IncidenceAngleList, IncidencePlaneAngleList, Description)

DetectorOptions = {
    'ReflectionNumber': -1,
    'ManualDetector': False,
    'DistanceDetector': FocalLength,
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
