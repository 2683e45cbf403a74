"""Mosaic warmup accounting (VERDICT r3 #5/#6).

The FIRST Pallas kernel executed in a process pays a one-time
Mosaic/toolchain warmup — measured 117-720 s through the axon TPU tunnel
(docs/performance.md, "Compile-time budget"); every later kernel compiles in
~2-3 s. Two consequences for the driver:

* a fresh-process CLI run that is about to dispatch a Pallas kernel should
  SAY so instead of stalling silently for minutes (:func:`note_dispatch`);
* for small one-shot runs the warmup can never pay for itself — engine
  auto-selection keeps those on the XLA path while the process is cold
  (:data:`BREAKEVEN_RAYS`; the XLA trace clears the 1e9 rays/s target too,
  BENCH_r03). Set ``ART_TPU_ENGINE=pallas`` or ``ART_TPU_ASSUME_WARM=1`` to
  override (benchmarks and long-lived services want the kernels regardless).
"""

from __future__ import annotations

import os
import sys

_WARM = False

#: below this many rays of fused work, a COLD process stays on XLA under
#: engine="auto" (override via ART_TPU_WARMUP_BREAKEVEN)
BREAKEVEN_RAYS = int(float(os.environ.get("ART_TPU_WARMUP_BREAKEVEN", "4e6")))


def assume_warm() -> bool:
    return os.environ.get("ART_TPU_ASSUME_WARM") == "1"


def mosaic_warm() -> bool:
    """True once this process has dispatched a Pallas kernel (or the user
    declared the warmup irrelevant via ART_TPU_ASSUME_WARM=1)."""
    return _WARM or assume_warm()


def mark_warm() -> None:
    global _WARM
    _WARM = True


def note_dispatch() -> None:
    """Call immediately before the first Pallas dispatch of a code path:
    prints a one-time notice when the process is about to pay the Mosaic
    warmup on a real TPU (no-op on CPU/interpret and once warm)."""
    global _WARM
    if _WARM:
        return
    import jax

    if jax.default_backend() != "cpu" and not assume_warm():
        print(
            "[attosecondraytracing_tpu] first Pallas kernel in this process: "
            "the one-time Mosaic toolchain warmup can take minutes on a "
            "tunneled TPU (subsequent kernels compile in seconds)...",
            file=sys.stderr,
            flush=True,
        )
    _WARM = True
