"""Task-level recovery from stale mid-fit checkpoints.

The core optimizers refuse to resume a checkpoint whose inputs,
iteration budget or parameter structure changed — and report a
corrupted/unreadable file the same way (core/optimize.CheckpointMismatch).
That refusal is correct for direct API users: silently continuing
against different data would corrupt the fit.  The pipeline TASKS
however re-derive their inputs from SQL/HDF5 on every run, so a changed
input under an unchanged checkpoint key is legitimate (re-extracted
stamps, re-run PSFs, a new iteration budget) — for them the right
behaviour is to discard the stale checkpoint and restart from scratch,
not to wedge every re-run until the user deletes a file by hand.
"""

from pathlib import Path


def run_discarding_stale_checkpoint(fn, checkpoint_path, logger):
    """Call ``fn()``; on a checkpoint-resume refusal
    (core/optimize.CheckpointMismatch: changed inputs/budget/structure
    or a corrupted file), delete the stale checkpoint and call it once
    more.  Any other error propagates."""
    from ..core.optimize import CheckpointMismatch

    try:
        return fn()
    except CheckpointMismatch as e:
        if checkpoint_path is None:
            raise
        logger.warning(
            f"Stale mid-fit checkpoint discarded, restarting fit: {e}")
        Path(checkpoint_path).unlink(missing_ok=True)
        return fn()
