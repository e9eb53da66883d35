"""Epoch-sharded joint fit across PROCESS boundaries (the pod story).

Two coordinator-connected processes, each with 2 virtual CPU devices,
run `fit_deconv_sharded` over the GLOBAL 4-device epoch mesh — the
XLA collectives (shared-parameter gradient psums) cross the process
boundary, exactly like DCN between TPU hosts.  Each process also runs
the same fit single-device locally and asserts the sharded result
matches; process results are cross-checked via allgather.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from lightcurver_tpu.parallel.distributed import initialize_distributed

port, pid = sys.argv[1], int(sys.argv[2])
initialize_distributed(coordinator_address=f"localhost:{port}",
                       num_processes=2, process_id=pid)
assert jax.device_count() == 4, jax.device_count()

import __graft_entry__ as ge
from lightcurver_tpu.parallel.mesh import epoch_mesh
from lightcurver_tpu.parallel.deconv import fit_deconv_sharded
from lightcurver_tpu.core.deconv.model import setup_model
from lightcurver_tpu.core.deconv.loss import Loss
from lightcurver_tpu.core.params import Params
from lightcurver_tpu.core.optimize import run_adabelief

# deterministic on every process (identical bytes -> device_put onto a
# cross-process sharding is well-defined)
data, sigma_2, psf, xs, ys, s = ge._toy_problem(
    n_epochs=8, n_pix=12, s=2, n_sources=2)
n_iter = 60

# single-device reference (local computation, no collectives).  Same
# matmul-DFT render the sharded path forces, so the 2e-4 trajectory
# bound below compares identical arithmetic and pins ONLY the
# collectives, not FFT-vs-DFT float noise.
model, ki, ku, kd, kf = setup_model(data, sigma_2, psf, xs, ys, s)
params = Params(ki, kf, ku, kd)
loss = Loss(data, model, params, sigma_2, irfft_backend="mxu")
best, _, hist_ref = run_adabelief(
    loss.loss_fn, params.free0, params.lower, params.upper, n_iter,
    init_learning_rate=1e-2, consts=loss.consts)
params.set_best(best)
a_ref = np.asarray(params.best_fit_values(
    as_kwargs=True)["kwargs_analytic"]["a"])

# global 4-device mesh spanning both processes
mesh = epoch_mesh(4)
assert {d.process_index for d in mesh.devices.ravel()} == {0, 1}
kwargs, _, hist = fit_deconv_sharded(
    data, sigma_2, psf, xs, ys, s, mesh, n_iter=n_iter,
    init_learning_rate=1e-2)

# loss history is replicated: directly comparable on every process
np.testing.assert_allclose(np.asarray(hist), np.asarray(hist_ref),
                           rtol=2e-4, atol=1e-3)

# per-epoch fluxes are SHARDED across processes: all-gather to a
# replicated array (a cross-process collective), then read locally
from jax.sharding import NamedSharding, PartitionSpec as P

gather = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))
a_global = np.asarray(gather(kwargs["kwargs_analytic"]["a"]))
np.testing.assert_allclose(a_global, a_ref, rtol=1e-3, atol=1e-3)

# ---- NON-divisible epoch count across processes (regression: the
# strip of the padding epochs materializes the result leaves with
# np.asarray, which raises on cross-process shards unless
# fit_deconv_sharded gathers them first).  7 epochs pad to 8, so the
# sharded optimizer program is reused from the fit above.
data7, sigma7, psf7, xs7, ys7, s7 = ge._toy_problem(
    n_epochs=7, n_pix=12, s=2, n_sources=2)
kwargs7, model7, hist7 = fit_deconv_sharded(
    data7, sigma7, psf7, xs7, ys7, s7, mesh, n_iter=n_iter,
    init_learning_rate=1e-2)
a7 = np.asarray(kwargs7["kwargs_analytic"]["a"])  # must not raise
assert a7.shape == (14,), a7.shape                # sized for REAL epochs
assert np.isfinite(a7).all()
assert np.isfinite(np.asarray(hist7)).all()
print(f"WORKER_OK {pid}")
"""


@pytest.mark.slow
def test_cross_process_sharded_fit_matches_single_device(tmp_path):
    sock = socket.socket()
    sock.bind(("localhost", 0))
    port = sock.getsockname()[1]
    sock.close()

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=str(tmp_path))
        for pid in (0, 1)
    ]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"WORKER_OK {pid}" in out, out
