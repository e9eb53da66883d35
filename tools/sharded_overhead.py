"""Sharded-vs-unsharded efficiency of the epoch-sharded ROI step.

VERDICT r3 #4: multi-chip evidence was correctness-only — the psum
overhead of the replicated h/c_x/c_y gradients was estimated by
dividing the UNSHARDED cost analysis by the device count, which assumes
perfect scaling.  This tool measures the SHARDED program directly, on a
virtual 8-device CPU mesh (the bench box has one real chip):

- per-step wall of one jitted value_and_grad of the production
  1000-epoch loss, sharded vs unsharded.  All virtual devices share the
  same host cores, so total FLOPs are identical and the wall delta IS
  the partitioning + collective overhead (an upper bound for real
  chips, where the collectives ride ICI but the FLOPs are split).
- the all-reduce payload bytes of the sharded program, read from the
  compiled HLO — the actual on-the-wire cost of replicating the shared
  background/position gradients (reference has no analog: it stacks all
  epochs on one device, reference processes/roi_modelling.py:154-178).

Must run in a FRESH process (XLA_FLAGS is read at backend init).
Prints one JSON line.  Usage:
    python tools/sharded_overhead.py [n_epochs n_pix n_timed]
"""

import json
import os
import pathlib
import re
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

N_DEV = 8


def _setup(n_dev):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def allreduce_bytes(hlo_text):
    """Sum the payload bytes of every all-reduce in compiled HLO text.

    Matches both scalar-shaped (``f32[4225]{0} all-reduce(``) and
    tuple-shaped (``(f32[64], f32[64]) all-reduce(``) result forms.
    """
    total = 0
    for stmt in re.finditer(r"= ([^=]*?) all-reduce\(", hlo_text):
        for width, dims in re.findall(r"\w*?(8|16|32|64)\[([0-9,]*)\]",
                                      stmt.group(1)):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * int(width) // 8
    return total


def main(n_epochs=1000, n_pix=64, n_timed=4):
    jax = _setup(N_DEV)
    from lightcurver_tpu.core.deconv.loss import Loss
    from lightcurver_tpu.core.deconv.model import setup_model
    from lightcurver_tpu.core.params import Params
    from lightcurver_tpu.parallel.deconv import (pad_epoch_stacks,
                                                 shard_consts,
                                                 shard_pytree)
    from lightcurver_tpu.parallel.mesh import epoch_mesh
    from lightcurver_tpu.utilities.synthetic import make_roi_scene

    scene = make_roi_scene(n_epochs=n_epochs, n_pix=n_pix, s=2,
                           n_sources=4)
    reg = dict(regularization_terms="l1_starlet",
               regularization_strength_scales=1.0,
               regularization_strength_hf=1.0,
               regularization_strength_positivity=100.0)

    def build(sharded):
        data = scene["data"]
        sigma_2 = scene["sigma_2"]
        psf = scene["psf"]
        epoch_w = None
        mesh = None
        if sharded:
            data, sigma_2, psf, epoch_w = pad_epoch_stacks(
                data, sigma_2, psf, N_DEV)
            mesh = epoch_mesh(N_DEV)
        model, kwargs_init, kwargs_up, kwargs_down, _ = setup_model(
            data, sigma_2, psf, scene["xs"], scene["ys"], scene["s"])
        params = Params(kwargs_init, {"kwargs_sersic": {}}, kwargs_up,
                        kwargs_down)
        if sharded:
            params.free0 = shard_pytree(mesh, params.free0)
            loss = Loss(data, model, params, sigma_2,
                        epoch_weights=epoch_w, **reg)
            loss.consts = shard_consts(mesh, loss.consts)
        else:
            loss = Loss(data, model, params, sigma_2, **reg)
        compiled = jax.jit(jax.value_and_grad(loss.loss_fn)).lower(
            params.free0, loss.consts).compile()
        jax.block_until_ready(compiled(params.free0, loss.consts))
        best = float("inf")
        for _ in range(n_timed):
            t0 = time.perf_counter()
            jax.block_until_ready(compiled(params.free0, loss.consts))
            best = min(best, time.perf_counter() - t0)
        return best, compiled

    t_unsharded, _ = build(False)
    t_sharded, compiled_s = build(True)
    ar_bytes = allreduce_bytes(compiled_s.as_text())
    print(json.dumps({
        "n_epochs": n_epochs,
        "n_pix": n_pix,
        "n_virtual_devices": N_DEV,
        "roi_sharded_vg_ms_8dev_cpu": round(t_sharded * 1e3, 2),
        "roi_sharded_vg_ms_1dev_cpu": round(t_unsharded * 1e3, 2),
        # equal-FLOP wall delta = partition + collective overhead
        "roi_sharded_step_overhead_pct": round(
            (t_sharded / t_unsharded - 1.0) * 100.0, 1),
        "roi_sharded_allreduce_mb_per_step": round(ar_bytes / 1e6, 3),
    }))


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
