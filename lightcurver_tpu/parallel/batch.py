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
    from .mesh import mesh_1d

    return mesh_1d(BATCH_AXIS, n_devices, devices)


def auto_batch_mesh():
    """The production mesh: all visible devices, or None on one device.

    The batched-fit entry points treat None as "no sharding" — a single
    chip runs the plain jitted vmap, multiple chips shard the batch
    axis, with no configuration needed from the pipeline tasks.
    """
    if jax.device_count() <= 1:
        return None
    return batch_mesh()


# single source of truth: the epoch-sharded deconv (parallel/deconv.py)
# and the 2-D star-fit mesh must agree on the axis name
from .mesh import EPOCH_AXIS  # noqa: E402  (re-export)


def batch_epoch_mesh(n_batch, n_epoch=None, devices=None):
    """2-D mesh over (``batch``, ``epoch``) — stars x epochs.

    For the monitoring configuration (a handful of stars x hundreds of
    epochs) a pure batch mesh idles ``n_devices - n_stars`` chips; the
    2-D mesh additionally shards each star's epoch axis.  XLA's
    propagation inserts the per-star reductions (loss sum, shared-
    parameter gradients) across the epoch shards — verified equivalent
    to the single-device fit at float precision
    (tests/test_parallel_batch.py).
    """
    if devices is None:
        devices = jax.devices()
    n_batch = int(n_batch)
    if n_epoch is None:
        n_epoch = len(devices) // n_batch
    devices = devices[: n_batch * int(n_epoch)]
    return Mesh(np.asarray(devices).reshape(n_batch, int(n_epoch)),
                (BATCH_AXIS, EPOCH_AXIS))


def auto_fit_mesh(n_items):
    """Production mesh for a batched fit of ``n_items`` independent
    problems with an inner epoch axis.

    - one device: None (plain vmap);
    - ``n_items >= n_devices``: 1-D batch mesh (collective-free);
    - ``n_items < n_devices``: 2-D (batch, epoch) mesh with the batch
      extent the largest divisor of the device count that ``n_items``
      can fill — the spare chips shard the epoch axis instead of
      idling.
    """
    n_dev = jax.device_count()
    if n_dev <= 1:
        return None
    if int(n_items) >= n_dev:
        return batch_mesh()
    # n_items < n_dev here, so n_batch < n_dev: the epoch axis always
    # gets a >1 extent on this path
    n_batch = max(d for d in range(1, n_dev + 1)
                  if n_dev % d == 0 and d <= int(n_items))
    return batch_epoch_mesh(n_batch)


def pad_epoch_axis(data, noisemap, psf, n_shards):
    """Pad axis 1 (epochs) to a multiple of ``n_shards``.

    Uses the documented dummy-epoch convention of fit_stars_batched:
    data 0, noise 1e7 (detected and zero-weighted by the loss), PSF a
    repeat of the last real epoch (well-conditioned spectra).
    Returns ``(data, noisemap, psf, n_pad)``.
    """
    n = data.shape[1]
    n_pad = (-n) % int(n_shards)
    if n_pad == 0:
        return data, noisemap, psf, 0
    widths = ((0, 0), (0, n_pad)) + ((0, 0),) * (data.ndim - 2)
    data = np.pad(np.asarray(data), widths)
    noisemap = np.pad(np.asarray(noisemap), widths,
                      constant_values=1e7)
    psf = np.concatenate(
        [np.asarray(psf),
         np.repeat(np.asarray(psf)[:, -1:], n_pad, axis=1)], axis=1)
    return data, noisemap, psf, n_pad


def shard_star_fit_arrays(mesh, data, noisemap, psf, keys):
    """Pad + shard the star-fit inputs onto a 1-D or 2-D mesh.

    Stars (axis 0) are padded to a multiple of the ``batch`` extent by
    repeating the last star; on a (``batch``, ``epoch``) mesh the
    epoch axis (axis 1) of data/noise/psf is additionally sharded
    (keys have no epoch axis and shard along ``batch`` only).

    Returns ``((data, noisemap, psf, keys), n_star_pad)``.
    """
    n = int(np.shape(data)[0])
    n_star_pad = (-n) % int(mesh.shape[BATCH_AXIS])

    def pad(a):
        a = np.asarray(a)
        if n_star_pad:
            a = np.concatenate([a, np.repeat(a[-1:], n_star_pad,
                                             axis=0)])
        return a

    two_d = EPOCH_AXIS in mesh.axis_names
    spec2 = P(BATCH_AXIS, EPOCH_AXIS) if two_d else P(BATCH_AXIS)
    spec1 = P(BATCH_AXIS)
    out = tuple(jax.device_put(pad(a), NamedSharding(mesh, spec))
                for a, spec in ((data, spec2), (noisemap, spec2),
                                (psf, spec2), (keys, spec1)))
    return out, n_star_pad


def strip_epoch_axis(out, n_pad):
    """Drop padded epochs from the epoch-axis leaves of a star-fit
    result dict (key set owned by core/deconv/batched next to the
    result-dict constructor: ``EPOCH_AXIS_RESULT_KEYS``)."""
    if n_pad == 0:
        return out
    from ..core.deconv.batched import EPOCH_AXIS_RESULT_KEYS

    return {k: (v[:, :-n_pad] if k in EPOCH_AXIS_RESULT_KEYS else v)
            for k, v in out.items()}


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


def gather_to_host(mesh, tree):
    """All-gather a sharded result tree to REPLICATED sharding.

    On a multi-host mesh the fit outputs are sharded across processes,
    and ``np.asarray`` on a non-fully-addressable array raises — every
    host must gather before materializing (the collective rides the
    same DCN/ICI as the fit itself).  Single-process meshes (including
    all single-host pods' local views) are already fully addressable:
    returned unchanged.  Exercised cross-process by
    tests/test_distributed_batch.py.
    """
    if mesh is None or jax.process_count() == 1:
        return tree
    from ..core.optimize import _replicate_jit

    # cached per mesh: repeated result gathers reuse one compiled program
    return _replicate_jit(mesh)(tree)
