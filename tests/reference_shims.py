"""Load the reference ART package (/root/reference) for parity tests.

The environment lacks three of the reference's dependencies
(``numpy-quaternion``, ``pyvista``/``pyvistaqt``, ``colorcet``), none of which
touch the numerics under test. This module provides:

* a pure-NumPy ``quaternion`` scalar implementing exactly the API surface the
  reference uses (ART/ModuleGeometry.py:13,325-328: 3/4-arg constructor,
  Hamilton product, ``np.exp``, ``np.conjugate``, ``.imag``), and
* no-op stand-ins for the plotting backends (only imported, never exercised —
  parity tests compare numbers, not figures),

and a cached :func:`load_reference` that installs the shims into
``sys.modules`` and imports the ART modules from /root/reference.
"""

from __future__ import annotations

import importlib
import sys
import types
from functools import lru_cache

import numpy as np

REFERENCE_ROOT = "/root/reference"


class quaternion:
    """Minimal numpy-quaternion stand-in (scalar, Hamilton algebra)."""

    __slots__ = ("w", "x", "y", "z")

    # Dispatch np.exp/np.conjugate/np.multiply to our methods instead of
    # wrapping results in 0-d object arrays (keeps the reference's
    # `q * vec * np.conjugate(q)` a plain quaternion chain).
    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        if method != "__call__" or kwargs:
            return NotImplemented
        if ufunc is np.exp:
            return inputs[0].exp()
        if ufunc is np.conjugate:
            return inputs[0].conjugate()
        if ufunc is np.multiply:
            a, b = inputs
            return a * b if isinstance(a, quaternion) else b.__rmul__(a)
        return NotImplemented

    def __init__(self, *args):
        if len(args) == 4:
            self.w, self.x, self.y, self.z = (float(a) for a in args)
        elif len(args) == 3:  # pure-imaginary, as numpy-quaternion does
            self.w = 0.0
            self.x, self.y, self.z = (float(a) for a in args)
        elif len(args) == 1:
            self.w, self.x, self.y, self.z = float(args[0]), 0.0, 0.0, 0.0
        else:
            raise TypeError(f"quaternion() takes 1, 3 or 4 args, got {len(args)}")

    def __mul__(self, o):
        if not isinstance(o, quaternion):
            return quaternion(self.w * o, self.x * o, self.y * o, self.z * o)
        return quaternion(
            self.w * o.w - self.x * o.x - self.y * o.y - self.z * o.z,
            self.w * o.x + self.x * o.w + self.y * o.z - self.z * o.y,
            self.w * o.y - self.x * o.z + self.y * o.w + self.z * o.x,
            self.w * o.z + self.x * o.y - self.y * o.x + self.z * o.w,
        )

    def __rmul__(self, o):
        return quaternion(self.w * o, self.x * o, self.y * o, self.z * o)

    def conjugate(self):
        return quaternion(self.w, -self.x, -self.y, -self.z)

    conj = conjugate

    def exp(self):
        v = np.array([self.x, self.y, self.z])
        n = float(np.linalg.norm(v))
        ew = float(np.exp(self.w))
        if n < 1e-300:
            return quaternion(ew, 0.0, 0.0, 0.0)
        s = ew * np.sin(n) / n
        return quaternion(ew * np.cos(n), *(s * v))

    @property
    def imag(self):
        return np.array([self.x, self.y, self.z])

    def __repr__(self):
        return f"quaternion({self.w}, {self.x}, {self.y}, {self.z})"


def _dummy_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)

    class _Anything:
        def __getattr__(self, _):
            return self

        def __call__(self, *a, **k):
            return self

    mod.__getattr__ = lambda _n, _a=_Anything(): _a  # type: ignore[attr-defined]
    return mod


@lru_cache(maxsize=1)
def load_reference():
    """Import the reference ART modules with dependency shims installed.

    Returns a namespace with mgeo/mray/msupp/mmirror/mmask/msource/moe/mchain/
    mp/mdet attributes mirroring the reference's own import aliases.
    """
    qmod = types.ModuleType("quaternion")
    qmod.quaternion = quaternion
    sys.modules.setdefault("quaternion", qmod)
    for name in ("pyvista", "pyvistaqt", "colorcet"):
        sys.modules.setdefault(name, _dummy_module(name))
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    ns = types.SimpleNamespace()
    ns.mgeo = importlib.import_module("ART.ModuleGeometry")
    ns.mray = importlib.import_module("ART.ModuleOpticalRay")
    ns.msupp = importlib.import_module("ART.ModuleSupport")
    ns.mmirror = importlib.import_module("ART.ModuleMirror")
    ns.mmask = importlib.import_module("ART.ModuleMask")
    ns.msource = importlib.import_module("ART.ModuleSource")
    ns.moe = importlib.import_module("ART.ModuleOpticalElement")
    ns.mchain = importlib.import_module("ART.ModuleOpticalChain")
    ns.mp = importlib.import_module("ART.ModuleProcessing")
    ns.mdet = importlib.import_module("ART.ModuleDetector")
    ns.mdef = importlib.import_module("ART.ModuleDefects")
    return ns


def raylist_to_arrays(raylist):
    """Reference list[Ray] -> (numbers, points, vectors, opl, intensity, incidence)."""
    numbers = np.array([r.number for r in raylist], dtype=int)
    points = np.array([r.point for r in raylist], dtype=float)
    vectors = np.array([r.vector for r in raylist], dtype=float)
    opl = np.array([sum(r.path) for r in raylist], dtype=float)
    intensity = np.array([r.intensity for r in raylist], dtype=float)
    incidence = np.array(
        [r.incidence if r.incidence is not None else np.nan for r in raylist], dtype=float
    )
    return numbers, points, vectors, opl, intensity, incidence
