"""Compatibility façade mirroring ART/ModuleProcessing.py's public surface.

CONFIG scripts that did ``import ART.ModuleProcessing as mp`` can switch to
``from attosecondraytracing_tpu import processing as mp`` and keep calling
``mp.OEPlacement(...)``, ``mp.FindOptimalDistance(...)`` etc. The heavy
lifting lives in the layered modules (ops/, models/, analysis/).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .analysis.optimizer import FindOptimalDistance  # noqa: F401
from .analysis import stats as _stats
from .models.placement import OEPlacement  # noqa: F401
from .ops.bundle import RayBundle
from .ops.trace import trace
from .utils.io import load_compressed, save_compressed  # noqa: F401


def RayTracingCalculation(source_rays: RayBundle, optical_elements, IgnoreDefects=True):
    """Trace a bundle through host OpticalElements; returns the list of
    bundles after each element (ART/ModuleProcessing.py:250-313)."""
    elements = [e.to_device() for e in optical_elements]
    return trace(source_rays, elements, ignore_defects=IgnoreDefects, keep_history=True)


def FindCentralRay(bundle: RayBundle):
    """(mean point, mean direction) of surviving rays as a tuple
    (ART/ModuleProcessing.py:464-482)."""
    return np.asarray(_stats.central_point(bundle)), np.asarray(_stats.central_direction(bundle))


def StandardDeviation(x):
    """SD of scalars, or sqrt(sum of per-axis variances) of point arrays
    (ART/ModuleProcessing.py:485-507)."""
    x = jnp.asarray(x)
    if x.ndim == 1:
        return float(jnp.std(x))
    return float(jnp.sqrt(jnp.var(x, axis=0).sum()))


def WeightedStandardDeviation(x, weights):
    """Intensity-weighted SD (ART/ModuleProcessing.py:510-532)."""
    x = jnp.asarray(x)
    w = jnp.asarray(weights)
    if x.ndim == 1:
        return float(_stats.std_scalar(x, w))
    return float(_stats.std_points(x, w))


def ReturnNumericalAperture(bundle: RayBundle, RefractiveIndex: float = 1.0):
    return float(_stats.numerical_aperture(bundle, RefractiveIndex))


def ReturnAiryRadius(Wavelength, NumericalAperture):
    return float(_stats.airy_radius(Wavelength, NumericalAperture))
