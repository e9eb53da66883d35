"""Batch-axis sharding for the embarrassingly-parallel vmapped fits.

The two non-ROI hot tasks — batched narrow-PSF fitting (frame axis,
core/psf/batched.py) and batched joint star photometry (star axis,
core/deconv/batched.py) — are pure vmaps: no term of any fit couples two
batch entries.  That maps onto a pod slice as pure data parallelism:
shard the leading batch axis across a 1-D ``batch`` mesh and let XLA
partition the already-batched program.  No collectives are required or
emitted (test_parallel_batch.py pins this on the compiled HLO), so
scaling is linear in chips up to the bucket size.

The reference runs both tasks serially on one device (reference
processes/psf_modelling.py:92, processes/star_photometry.py:257); the
epoch-sharded ROI solve (parallel/deconv.py) covers the third hot task.

Non-divisible batch counts are padded by REPEATING the last real entry
(a duplicate fit is numerically identical work and keeps every dummy
input as well-conditioned as a real one); padded results are stripped
before returning, so callers see exactly the real batch.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def batch_mesh(n_devices=None, devices=None):
    """1-D mesh over the ``batch`` axis (frames or stars).

    Args:
        n_devices: use the first ``n_devices`` visible devices
            (default: all).
        devices: explicit device list (overrides n_devices).
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[: int(n_devices)]
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def auto_batch_mesh():
    """The production mesh: all visible devices, or None on one device.

    The batched-fit entry points treat None as "no sharding" — a single
    chip runs the plain jitted vmap, multiple chips shard the batch
    axis, with no configuration needed from the pipeline tasks.
    """
    if jax.device_count() <= 1:
        return None
    return batch_mesh()


def pad_batch_arrays(mesh, *arrays):
    """Pad leading axes to a multiple of the mesh size and shard them.

    Every array is padded by repeating its LAST entry (well-conditioned
    duplicate work, exactly stripped by :func:`strip_batch`) and
    device_put with the leading axis sharded along ``batch``.

    Returns ``(sharded_arrays, n_pad)``.
    """
    n = int(np.shape(arrays[0])[0])
    n_pad = (-n) % int(mesh.size)
    sharding = NamedSharding(mesh, P(BATCH_AXIS))
    out = []
    for arr in arrays:
        a = np.asarray(arr)
        if a.shape[0] != n:
            raise ValueError(
                f"inconsistent leading batch axes: {a.shape[0]} vs {n}")
        if n_pad:
            a = np.concatenate([a, np.repeat(a[-1:], n_pad, axis=0)])
        out.append(jax.device_put(a, sharding))
    return tuple(out), n_pad


def strip_batch(tree, n_pad):
    """Drop the padded batch entries from every leaf of a result tree."""
    if n_pad == 0:
        return tree
    return jax.tree_util.tree_map(lambda x: x[:-n_pad], tree)
