"""OpticalElement: pose of an optic in the lab frame, plus (mis)alignment
methods (ART/ModuleOpticalElement.py).

The pose is (position, normal, majoraxis) exactly as in the reference,
including the normal-setter behavior of co-rotating the majoraxis
(ART/ModuleOpticalElement.py:125-141). Angles are in degrees, distances in mm.

``to_device()`` compiles the pose + optic into the NamedTuple consumed by the
batched trace: the lab->optic rotation matrix replaces the reference's
per-ray quaternion rotations.
"""

from __future__ import annotations

import numpy as np

from ..ops import host_geometry as hg
from ..ops.trace import MaskElement, MirrorElement
from .masks import Mask
from .mirrors import DeformedMirror


class OpticalElement:
    """Pose of an optic (mirror or mask) in the lab frame."""

    def __init__(self, Type, Position, Normal, MajorAxis):
        self._type = Type
        self.position = np.asarray(Position, dtype=float)
        self._normal = hg.normalize(Normal)
        self._majoraxis = hg.normalize(MajorAxis)
        if abs(np.dot(self._normal, self._majoraxis)) > 1e-9:
            raise ValueError("The normal and major axis of optical elements need to be orthogonal!")

    @property
    def type(self):
        """The optic (Mirror/Mask object); name kept from the reference."""
        return self._type

    optic = type  # clearer alias

    @property
    def position(self):
        return self._position

    @position.setter
    def position(self, NewPosition):
        p = np.asarray(NewPosition, dtype=float)
        if p.shape != (3,):
            raise TypeError("Position must be a 3D vector.")
        self._position = p

    @property
    def normal(self):
        return self._normal

    @normal.setter
    def normal(self, NewNormal):
        """Setting a new normal co-rotates the majoraxis to keep it
        perpendicular (ART/ModuleOpticalElement.py:125-141)."""
        new = hg.normalize(NewNormal)
        if abs(np.dot(new, self._majoraxis)) > 1e-12:
            axis = np.cross(self._normal, new)
            angle = hg.angle_between(self._normal, new)
            self._majoraxis = hg.rotate_vector(axis, angle, self._majoraxis)
        self._normal = new

    @property
    def majoraxis(self):
        return self._majoraxis

    @majoraxis.setter
    def majoraxis(self, NewMajorAxis):
        new = hg.normalize(NewMajorAxis)
        if abs(np.dot(self._normal, new)) > 1e-12:
            raise ValueError("The normal and major axis of optical elements need to be orthogonal!")
        self._majoraxis = new

    # ------------------------------------------------------------------
    # content identity (retrace caching, ART/ModuleOpticalElement.py:161-165)
    def __hash__(self):
        return hash(
            (
                tuple(self._position),
                tuple(self._normal),
                tuple(self._majoraxis),
                hash(self._type),
            )
        )

    # ------------------------------------------------------------------
    # (mis-)alignment methods; angles in degrees, distances in mm
    def rotate_pitch_by(self, angle):
        """Rotate about (normal x majoraxis) — the incidence-angle knob
        (ART/ModuleOpticalElement.py:169-185)."""
        axis = np.cross(self._normal, self._majoraxis)
        self.normal = hg.rotate_vector(axis, np.deg2rad(angle), self._normal)

    def rotate_roll_by(self, angle):
        """Rotate about the majoraxis (ART/ModuleOpticalElement.py:187-197)."""
        self.normal = hg.rotate_vector(self._majoraxis, np.deg2rad(angle), self._normal)

    def rotate_yaw_by(self, angle):
        """Rotate about the normal (ART/ModuleOpticalElement.py:199-208)."""
        self.majoraxis = hg.rotate_vector(self._normal, np.deg2rad(angle), self._majoraxis)

    def rotate_random_by(self, angle, rng=None):
        rng = np.random if rng is None else rng
        self.normal = hg.rotate_vector(rng.random(3), np.deg2rad(angle), self._normal)

    def shift_along_normal(self, distance):
        self.position = self._position + distance * self._normal

    def shift_along_major(self, distance):
        self.position = self._position + distance * self._majoraxis

    def shift_along_cross(self, distance):
        self.position = self._position + distance * hg.normalize(np.cross(self._normal, self._majoraxis))

    def shift_along_random(self, distance, rng=None):
        rng = np.random if rng is None else rng
        self.position = self._position + distance * hg.normalize(rng.random(3))

    # ------------------------------------------------------------------
    def frame_rotation(self) -> np.ndarray:
        """Lab->optic rotation matrix (rows: majoraxis, n x m, normal)."""
        return hg.frame_rotation(self._normal, self._majoraxis)

    def to_device(self, dtype=None):
        """Build the element NamedTuple consumed by the trace.

        Leaves are host NumPy arrays on purpose: they are jit *inputs* (or get
        packed into a single transfer, see ops/packing.py); creating them as
        device arrays here would cost one tunnel RPC per tiny leaf.
        ``dtype`` defaults to the ``ART_TPU_DTYPE`` override when set (surface
        and support parameters are weakly-typed python floats and follow the
        bundle/pose dtype inside jit)."""
        if dtype is None:
            from ..ops.precision import env_dtype

            dtype = env_dtype()
        rot = np.asarray(self.frame_rotation(), dtype=dtype)
        pos = np.asarray(self._position, dtype=dtype)
        optic = self._type
        if isinstance(optic, Mask):
            el = MaskElement(rot=rot, position=pos, support=optic.support)
        else:
            defects = optic.device_defects() if isinstance(optic, DeformedMirror) else ()
            el = MirrorElement(
                rot=rot,
                position=pos,
                centre=np.asarray(optic.get_centre(), dtype=dtype),
                surface=optic.surface_params(),
                support=optic.support,
                defects=defects,
            )
        if dtype is not None:
            # cast ARRAY float leaves (defect grids etc.); python-float
            # scalars stay weakly typed at full precision — they follow the
            # bundle dtype inside jit without pre-rounding the geometry
            # (pre-rounding a toroid radius to f32 moves the surface by
            # ~0.5 um and doubles the f32 delay noise floor)
            import jax

            def _cast(x):
                if isinstance(x, (float, np.floating)):
                    return float(x)  # builtin = weakly typed, full precision
                if isinstance(x, (int, np.integer)):
                    return int(x)
                a = np.asarray(x)
                return a.astype(dtype) if np.issubdtype(a.dtype, np.floating) else a

            el = jax.tree.map(_cast, el)
        return el
