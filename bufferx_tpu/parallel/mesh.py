"""Device mesh construction.

The reference has no distributed layer at all (SURVEY §2.7: a vestigial
single-GPU ``DataParallel`` wrapper). Here the scaling axes are:

- ``dp``: scan pairs (the natural data-parallel unit — pairs are
  independent);
- ``fp``: pose-graph factors (residual/Hessian reductions in the
  multi-frame layer ride ``psum`` over this axis).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans hosts — shardings place pair batches on local chips and
collectives ride ICI/DCN.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))
