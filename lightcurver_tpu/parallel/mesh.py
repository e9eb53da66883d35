"""Device-mesh construction for the epoch-sharded joint solves.

The reference has no distributed layer at all (SURVEY.md §2.4); here the
epoch axis of the joint multi-epoch fits — the reference's moral
"sequence" axis (reference processes/roi_modelling.py:154-178 stacks all
epochs in one device array) — becomes a sharded mesh axis.  Shared
parameters (background ``h``, source positions ``c_x/c_y``) are
replicated; XLA inserts the psum over ICI for their gradients.
"""

import jax
import numpy as np
from jax.sharding import Mesh


EPOCH_AXIS = "epoch"


def mesh_1d(axis_name, n_devices=None, devices=None):
    """1-D mesh constructor shared by the epoch and batch meshes.

    Args:
        axis_name: the single mesh-axis name.
        n_devices: use the first ``n_devices`` visible devices
            (default: all).
        devices: explicit device list (overrides n_devices).
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[: int(n_devices)]
    return Mesh(np.asarray(devices), (axis_name,))


def epoch_mesh(n_devices=None, devices=None):
    """1-D mesh over the epoch axis (see :func:`mesh_1d`).

    Returns:
        jax.sharding.Mesh with a single axis named ``"epoch"``.
    """
    return mesh_1d(EPOCH_AXIS, n_devices, devices)
