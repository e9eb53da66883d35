"""Multi-host initialization for pod-scale epoch sharding.

Single-host multi-chip needs nothing: `epoch_mesh()` sees all local
devices.  Across hosts (v5e pods and beyond), call
:func:`initialize_distributed` once per process before any jax use; the
epoch mesh then spans every chip in the slice and XLA routes the shared-
parameter psums over ICI within a slice and DCN across slices.
"""

import logging
import os


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """jax.distributed.initialize with environment auto-detection.

    On Cloud TPU the three arguments are auto-detected; elsewhere set
    them explicitly or via JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID.  Safe to call when already initialized (no-op).
    """
    import jax

    logger = logging.getLogger("lightcurver.distributed")
    kwargs = {}
    has_coordinator = bool(coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    has_explicit_topology = (
        num_processes is not None or process_id is not None
        or bool(os.environ.get("JAX_NUM_PROCESSES"))
        or bool(os.environ.get("JAX_PROCESS_ID")))
    if not has_coordinator and has_explicit_topology:
        # silently dropping the explicit topology and auto-detecting
        # would produce a wrong (or hung) initialization with no hint
        raise ValueError(
            "num_processes/process_id were given (as arguments or "
            "JAX_NUM_PROCESSES/JAX_PROCESS_ID) without a "
            "coordinator_address (or JAX_COORDINATOR_ADDRESS); all "
            "three are needed for an explicit bootstrap")
    if has_coordinator:
        kwargs["coordinator_address"] = (
            coordinator_address
            or os.environ["JAX_COORDINATOR_ADDRESS"])
        # `or` would misroute an explicit process_id=0 (falsy) to the env
        kwargs["num_processes"] = int(
            num_processes if num_processes is not None
            else os.environ.get("JAX_NUM_PROCESSES", 1))
        kwargs["process_id"] = int(
            process_id if process_id is not None
            else os.environ.get("JAX_PROCESS_ID", 0))
    try:
        jax.distributed.initialize(**kwargs)
        logger.info(
            f"jax.distributed initialized: process "
            f"{jax.process_index()}/{jax.process_count()}, "
            f"{jax.device_count()} global devices.")
    except RuntimeError as e:
        # this jax raises "distributed.initialize should only be called
        # once."; older versions said "already initialized" — match both
        msg = str(e).lower()
        if "already" in msg or "only be called once" in msg:
            logger.info("jax.distributed already initialized.")
        else:
            raise
