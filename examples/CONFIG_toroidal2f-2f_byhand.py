"""Single toroidal 2f-2f set up *by hand*: mirror at the origin, source placed
explicitly (port of CONFIG_toroidal2f-2f_byhand.py)."""
import numpy as np
from attosecondraytracing_tpu import mirrors as mmirror
from attosecondraytracing_tpu import supports as msupp
from attosecondraytracing_tpu import sources as msource
from attosecondraytracing_tpu import OpticalChain, OpticalElement

SourceProperties = {
    'Divergence': 15e-3/2,
    'SourceSize': 0,
    'Wavelength': 50e-6,
    'DeltaFT': 0.5,
    'NumberRays': 1000,
}

description = ('single toroidal in 2f-2f config,\n set up "byhand", with the mirror '
               'sitting at the origin and the source at [Sx,Sy,Sz]')
AngleIncidence, Focal = 80, 300
R, r = mmirror.ReturnOptimalToroidalRadii(Focal, AngleIncidence)
Mirror = mmirror.MirrorToroidal(R, r, msupp.SupportRectangle(120, 30))
Element1 = OpticalElement(Mirror, np.array([0, 0, 0]), np.array([0, 0, 1.0]), np.array([1.0, 0, 0]))

MisalignAngle = 0.00  # deg
Sx = 2*Focal*np.sqrt(1 - np.cos(np.deg2rad(AngleIncidence + MisalignAngle))**2)
Sz = 2*Focal*np.cos(np.deg2rad(AngleIncidence + MisalignAngle))
SourcePoint = np.array([Sx, 0, Sz])
SourceRayList = msource.PointSource(SourcePoint, -SourcePoint, SourceProperties["Divergence"],
                                    SourceProperties["NumberRays"], SourceProperties["Wavelength"])
SourceRayList = msource.ApplyGaussianIntensityToRayList(SourceRayList, 1/np.e**2)
OpticalChainList = OpticalChain(SourceRayList, [Element1], description,
                                loop_variable_name="incidence misalignment (deg)",
                                loop_variable_value=MisalignAngle)

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
