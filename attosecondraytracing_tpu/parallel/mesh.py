"""Device-mesh sharding for the ray tracer.

The domain's natural parallel axes (SURVEY.md §2.2, §5.7):

* ``rays`` — embarrassingly parallel data axis (the reference's per-ray Python
  loop, ART/ModuleMirror.py:912-939). Rays never interact; the only cross-ray
  operations are detector reductions (mean/SD/transmission), which XLA turns
  into ``psum``-style collectives over the mesh automatically when inputs are
  sharded and outputs are replicated.
* ``scan`` — the parameter-scan axis (the reference's serial
  ``OpticalChainList`` loop, ARTmain.py:326-332), mapped to ``jax.vmap`` over
  stacked element parameters and optionally sharded across devices.

Element parameters are tiny and replicated. Multi-host TPU slices initialize
via :func:`distributed_init`; CI uses ``--xla_force_host_platform_device_count``
to fake an 8-device CPU mesh (same code path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.bundle import RayBundle, pad_bundle
from ..ops.trace import trace


def distributed_init(**kwargs):
    """Initialize JAX multi-host distributed runtime (no-op if single host)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        pass  # already initialized or single-process


def make_mesh(rays: int | None = None, scan: int = 1, devices=None) -> Mesh:
    """Build a ('scan', 'rays') mesh. ``rays=None`` uses all remaining
    devices for the ray axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if rays is None:
        rays = n // scan
    if scan * rays != n:
        raise ValueError(f"scan*rays = {scan}*{rays} != {n} devices")
    return Mesh(devices.reshape(scan, rays), ("scan", "rays"))


def bundle_sharding(mesh: Mesh, axis: str = "rays", batched: bool = False):
    """NamedSharding for a RayBundle: leading ray axis sharded, wavelength
    replicated. ``batched=True`` expects a leading scan axis."""
    if batched:
        arr = NamedSharding(mesh, P("scan", axis))
        scalar = NamedSharding(mesh, P("scan"))
    else:
        arr = NamedSharding(mesh, P(axis))
        scalar = NamedSharding(mesh, P())
    return RayBundle(
        p=arr, d=arr, opl=arr, opl_c=arr, alive=arr, intensity=arr, incidence=arr, wavelength=scalar
    )


def shard_bundle(bundle: RayBundle, mesh: Mesh, axis: str = "rays") -> RayBundle:
    """Place a bundle on the mesh with the ray axis sharded (padding dead rays
    so N divides the axis size)."""
    n_dev = mesh.shape[axis]
    n = bundle.n_rays
    n_pad = ((n + n_dev - 1) // n_dev) * n_dev
    bundle = pad_bundle(bundle, n_pad)
    return jax.device_put(bundle, bundle_sharding(mesh, axis))


@partial(jax.jit, static_argnames=("ignore_defects", "keep_history"))
def _trace_jit(source, elements, ignore_defects, keep_history):
    return trace(source, elements, ignore_defects=ignore_defects, keep_history=keep_history)


def trace_sharded(
    source: RayBundle,
    elements,
    mesh: Mesh,
    ignore_defects: bool = True,
    keep_history: bool = False,
):
    """Trace with the ray axis sharded over ``mesh``. Element parameters are
    replicated; the per-ray math is local to each device (no communication
    until a reduction is taken on the result)."""
    src = shard_bundle(source, mesh)
    elements = jax.device_put(elements, NamedSharding(mesh, P()))
    return _trace_jit(src, elements, ignore_defects, keep_history)


# ---------------------------------------------------------------------------
# batched parameter scans (vmap over stacked chains)
# ---------------------------------------------------------------------------


def stack_chains(chains):
    """Stack the device elements of structurally-identical chains along a
    leading scan axis; returns (stacked_elements, stacked_sources).

    This is the TPU-native replacement for looping over
    ``OpticalChainList`` (ARTmain.py:326-332): one vmapped trace evaluates the
    whole scan at once.
    """
    element_lists = [c.device_elements() for c in chains]
    treedefs = {jax.tree_util.tree_structure(e) for e in element_lists}
    if len(treedefs) != 1:
        raise ValueError("chains have different element structures; cannot batch the scan")
    stacked_elements = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *element_lists)
    sources = [c.source_rays for c in chains]
    stacked_sources = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *sources)
    return stacked_elements, stacked_sources


@partial(jax.jit, static_argnames=("ignore_defects",))
def trace_scan(stacked_sources, stacked_elements, ignore_defects: bool = True):
    """vmapped trace over the scan axis; returns the stacked final bundles."""
    return jax.vmap(
        lambda src, els: trace(src, els, ignore_defects=ignore_defects, keep_history=False)
    )(stacked_sources, stacked_elements)


def trace_scan_sharded(chains, mesh: Mesh, ignore_defects: bool = True):
    """Batch a chain scan over the ('scan', 'rays') mesh: scan axis and ray
    axis both sharded."""
    stacked_elements, stacked_sources = stack_chains(chains)
    n_scan = mesh.shape["scan"]
    n_chains = len(chains)
    if n_chains % n_scan:
        raise ValueError(f"number of chains {n_chains} must divide the scan axis {n_scan}")
    src = jax.device_put(stacked_sources, bundle_sharding(mesh, batched=True))
    els = jax.device_put(stacked_elements, NamedSharding(mesh, P()))
    return trace_scan(src, els, ignore_defects=ignore_defects)
