"""Batch-sharded fits across PROCESS boundaries (multi-host pods).

Complement of test_distributed_fit.py for the two round-3 sharded
tasks: two coordinator-connected processes (2 virtual CPU devices
each) run ``fit_stars_batched`` and ``build_psf_batched`` over GLOBAL
4-device batch meshes.  The fits themselves are collective-free data
parallelism, but the RESULTS land sharded across processes — the
``gather_to_host`` all-gather (parallel/batch.py) is what lets every
host materialize them; without it np.asarray raises on
non-addressable shards (the production multi-host crash this test
pins).  Each process compares against its own single-device fit.
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
assert jax.process_count() == 2

from lightcurver_tpu.core.deconv.batched import fit_stars_batched
from lightcurver_tpu.core.psf.batched import build_psf_batched
from lightcurver_tpu.parallel.batch import batch_mesh
from lightcurver_tpu.utilities.synthetic import make_star_stamps

# ---- star photometry: 5 stars (non-divisible by the 4-device mesh)
data, noise, psf = [], [], []
for sidx in range(5):
    st = make_star_stamps(n_stars=6, n_pix=16, s=2, seed=20 + sidx,
                          fwhm_x=2.6, fwhm_y=2.6)
    data.append(st["data"])
    noise.append(st["sigma"])
    m = st["psf_true"].shape[-1]
    psf.append(np.broadcast_to(st["psf_true"], (6, m, m)))
data, noise, psf = np.stack(data), np.stack(noise), np.stack(psf)

kw = dict(n_iter=120)
ref = fit_stars_batched(data, noise, psf, 2, mesh=None, **kw)
shd = fit_stars_batched(data, noise, psf, 2, mesh=batch_mesh(4), **kw)
assert shd["fluxes"].shape == ref["fluxes"].shape
np.testing.assert_allclose(shd["fluxes"], ref["fluxes"], rtol=2e-3)
np.testing.assert_allclose(shd["chi2_per_frame"], ref["chi2_per_frame"],
                           rtol=1e-2)

# ---- PSF fitting: 3 frames (fewer than devices; pads to 4)
frames = [make_star_stamps(n_stars=4, n_pix=20, s=2, seed=10 + i,
                           fwhm_x=2.4 + 0.2 * i, fwhm_y=2.6)
          for i in range(3)]
fdata = np.stack([f["data"] for f in frames])
fsigma = np.stack([f["sigma"] for f in frames])

pkw = dict(n_iter_analytic=25, n_iter_adabelief=100)
pref = build_psf_batched(fdata, fsigma, 2, mesh=None, **pkw)
pshd = build_psf_batched(fdata, fsigma, 2, mesh=batch_mesh(4), **pkw)
assert pshd["narrow_psf"].shape == pref["narrow_psf"].shape
# convergence-level parity, mirroring the single-process test
# (tests/test_parallel_batch.py::test_psf_batch_sharded_matches_unsharded):
# the partitioned executable rounds differently and the cross-process
# unsharded reference runs the fft backend vs the mesh's forced mxu
np.testing.assert_allclose(pshd["chi2"], pref["chi2"], rtol=2e-2)
peak = pref["full_psf"].max()
np.testing.assert_allclose(pshd["full_psf"] / peak,
                           pref["full_psf"] / peak, atol=3e-2)
np.testing.assert_allclose(pshd["kwargs_moffat"]["fwhm_x"],
                           pref["kwargs_moffat"]["fwhm_x"], rtol=1e-2)

# ---- checkpointed batched fit on the cross-process mesh (regression:
# save_state must gather the process-sharded optimizer carry before
# np.asarray, and only process 0 writes the file)
import pathlib

ckpt = pathlib.Path("star_fit.ckpt.npz").absolute()  # shared cwd
ck = fit_stars_batched(data, noise, psf, 2, mesh=batch_mesh(4),
                       checkpoint_path=str(ckpt), checkpoint_every=60,
                       **kw)
np.testing.assert_allclose(ck["fluxes"], shd["fluxes"], rtol=1e-4)
if pid == 0:
    assert ckpt.exists()  # written by process 0 only (after the sync)

# ---- RESUME on the cross-process mesh (regression: the npz leaves
# are host-local; _load_ckpt_carry must device_put them back onto the
# global mesh with the fresh carry's shardings or the finalize jit
# rejects them).  The completed run above left done == n_iter in the
# file, so this loads, skips all segments, and finalizes from the
# restored carry.
ck2 = fit_stars_batched(data, noise, psf, 2, mesh=batch_mesh(4),
                        checkpoint_path=str(ckpt), checkpoint_every=60,
                        **kw)
np.testing.assert_allclose(ck2["fluxes"], ck["fluxes"], rtol=1e-6)
print(f"WORKER_OK {pid}")
"""


@pytest.mark.slow
def test_cross_process_batch_sharded_fits_match_single_device(tmp_path):
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
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"WORKER_OK {pid}" in out, out
