"""Headline benchmark: 100-epoch joint ROI deconvolution wall time.

Mirrors the BASELINE.json metric ("PSF fits/sec/chip + 100-epoch joint ROI
deconv wall-time at chi2 parity").  The reference does the ROI joint
deconvolution in "a few minutes at least" on CPU (reference
docs/mkdocs/contents/tutorial.md:390); 180 s is used as the baseline.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "s", "vs_baseline": N, ...}

Run: python bench.py            (uses whatever JAX backend is live)
"""

import json
import os
import pathlib
import time

import numpy as np

# metrics recorded incrementally by main(); _emit() prints the current
# snapshot as a COMPLETE JSON line after every finished metric, so the
# driver (which parses the last JSON line of the tail) records whatever
# completed even if the process is killed mid-run.  Round 3 lost ALL
# perf evidence to a wedged tunnel because metrics were only printed at
# the very end — never again.
_METRICS = {}
# per-repeat wall samples of the best-of-N metrics: the min shields
# against tenant contention, but ONLY the min would hide an
# intermittent real regression (e.g. an every-other-run recompile) —
# the spread makes bimodality visible in the recorded JSON
_SAMPLES = {}


def _emit():
    """Print the full metrics snapshot as one JSON line (last line wins)."""
    out = {"metric": "roi_deconv_100epoch_wall_s", "value": None,
           "unit": "s", "vs_baseline": None}
    out.update(_METRICS)
    out["wall_samples"] = _SAMPLES
    print(json.dumps(out), flush=True)


def _put(**kv):
    """Record metrics (NaN -> null) and emit the updated snapshot."""
    for k, v in kv.items():
        _METRICS[k] = None if isinstance(v, float) and v != v else v
    _emit()


def _probe_backend(deadline=None):
    """True if the default backend completes a tiny jit under a deadline.

    The tunneled TPU backend can wedge INDEFINITELY (measured
    2026-08-17: a 64 MB host->device transfer stalled > 9 min while the
    CPU suite ran green) — and a wedged client never recovers
    in-process, so the probe must run in a fresh subprocess.
    """
    import subprocess
    import sys

    if deadline is None:
        deadline = float(os.environ.get("LIGHTCURVER_BENCH_PROBE_S", 90))
    # the canonical probe (64 MB h2d + 4k matmul): sized to catch the
    # OBSERVED wedge mode — large transfers stalling while tiny ops
    # still succeed
    probe = pathlib.Path(__file__).parent / "tools" / "tpu_probe.py"
    try:
        r = subprocess.run([sys.executable, str(probe)],
                           timeout=deadline, capture_output=True,
                           text=True)
        if r.returncode == 0 and '"matmul_ms"' in r.stdout:
            return True
        print(f"# probe exited rc={r.returncode}: "
              f"{(r.stderr or r.stdout)[-400:]}", flush=True)
        return False
    except subprocess.TimeoutExpired:
        print(f"# probe timed out after {deadline:.0f}s", flush=True)
        return False


def _start_watchdog():
    """Emit the JSON line with whatever completed, rather than hang.

    The driver records bench.py's output once per round; a wedged
    backend must degrade that to partial metrics, never to nothing.
    With incremental emission (_emit after every metric) the watchdog
    is a belt-and-braces second line of defence — a kill between
    emissions loses only the in-flight metric.
    """
    import threading

    # with incremental emission the watchdog no longer protects capture
    # integrity (every completed metric is already on stdout) — it only
    # bounds a WEDGED in-flight metric, so it can afford to be generous
    # enough never to curtail a healthy-but-slow cold-compile run: an
    # external (driver) kill yields the same last-line capture as the
    # self-exit, so firing BEFORE the driver's own budget only wastes
    # measurable time (a cold-cache healthy lane plus the A/B and
    # sharded stages can legitimately exceed 30 min)
    deadline = float(os.environ.get("LIGHTCURVER_BENCH_DEADLINE_S", 2700))

    def fire():
        _METRICS["watchdog_timeout_s"] = deadline
        _emit()
        os._exit(3)

    t = threading.Timer(deadline, fire)
    t.daemon = True
    t.start()
    return t


def _setup_jax():
    import jax

    cache = pathlib.Path(__file__).parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if (os.environ.get("LIGHTCURVER_BENCH_NO_PROBE") != "1"
            and not _probe_backend()):
        # unresponsive accelerator: a degraded CPU line beats a hang.
        # ONE probe attempt only: round 3 burned 600 s on two 300 s
        # probes and the driver killed the run before any JSON line.
        print("# backend probe unresponsive; falling back to CPU",
              flush=True)
        jax.config.update("jax_platforms", "cpu")
        # drop the persistent cache: its entries were compiled for the
        # accelerator host's CPU — loading another machine's CPU AOT
        # code risks SIGILL (XLA logs exactly that)
        jax.config.update("jax_compilation_cache_dir", None)
        _METRICS["backend_fallback"] = "cpu (default backend probe hung)"
    from lightcurver_tpu import ops

    ops.auto_select_backends()
    return jax


def run_roi_deconv(scene, n_iter=2000, repeats=2, samples_key=None):
    import jax
    import jax.numpy as jnp
    from lightcurver_tpu.core.deconv.model import setup_model
    from lightcurver_tpu.core.deconv.loss import Loss
    from lightcurver_tpu.core.params import Params
    from lightcurver_tpu.core.optimize import run_adabelief

    data, sigma_2 = scene["data"], scene["sigma_2"]
    n_real = data.shape[0]

    # epoch-shard over all devices; non-divisible counts pad with
    # exactly-masked dummy epochs (the production path)
    n_dev = jax.device_count()
    reg = dict(regularization_terms="l1_starlet",
               regularization_strength_scales=1.0,
               regularization_strength_hf=1.0,
               regularization_strength_positivity=100.0)
    if n_dev > 1:
        from lightcurver_tpu.parallel.mesh import epoch_mesh
        from lightcurver_tpu.parallel.deconv import (pad_epoch_stacks,
                                                     shard_consts,
                                                     shard_pytree)

        data, sigma_2, psf, epoch_w = pad_epoch_stacks(
            data, sigma_2, scene["psf"], n_dev)
        mesh = epoch_mesh(n_dev)
        model, kwargs_init, kwargs_up, kwargs_down, _ = setup_model(
            data, sigma_2, psf, scene["xs"], scene["ys"], scene["s"])
        params = Params(kwargs_init, {"kwargs_sersic": {}}, kwargs_up,
                        kwargs_down)
        params.free0 = shard_pytree(mesh, params.free0)
        params.fixed = shard_pytree(mesh, params.fixed)
        params.lower = shard_pytree(mesh, params.lower)
        params.upper = shard_pytree(mesh, params.upper)
        loss = Loss(data, model, params, sigma_2, epoch_weights=epoch_w,
                    **reg)
        loss.consts = shard_consts(mesh, loss.consts)
    else:
        model, kwargs_init, kwargs_up, kwargs_down, _ = setup_model(
            data, sigma_2, scene["psf"], scene["xs"], scene["ys"],
            scene["s"])
        params = Params(kwargs_init, {"kwargs_sersic": {}}, kwargs_up,
                        kwargs_down)
        loss = Loss(data, model, params, sigma_2, **reg)
    consts = loss.consts

    from lightcurver_tpu.core.fisher import linear_flux_solve

    # production finalize (processes/roi_modelling.py): exact GLS flux
    # polish at the fitted positions/background — the model is linear
    # in the fluxes, so this removes the optimizer's flux convergence
    # tail in closed form.  Timed as part of the fit.
    eval_consts = model.consts()
    polish = jax.jit(lambda kw, d, s2, c: linear_flux_solve(
        kw, d, s2, model, c))
    data_j = jnp.asarray(data)
    sigma_j = jnp.asarray(sigma_2)

    def fit(free0):
        best, _, hist = run_adabelief(
            loss.loss_fn, free0, params.lower, params.upper,
            n_iter, init_learning_rate=1e-2, consts=consts)
        params.set_best(best)
        kwargs = params.best_fit_values(as_kwargs=True)
        kwargs = polish(kwargs, data_j, sigma_j, eval_consts)
        # fetch a value: on the tunneled backend block_until_ready
        # returns before execution finishes; a host transfer does not
        float(kwargs["kwargs_analytic"]["a"][0])
        float(hist[-1])
        return kwargs, hist

    fit(params.free0)            # compile + first run
    # best-of-N steady-state repeats: the shared tunneled backend shows
    # transient multi-x slowdowns (other tenants); the best repeat is
    # the machine's actual speed.  Perturbed restarts so no caching
    # layer can replay the result.
    if samples_key:
        # a crashed attempt re-run by _retry must not leave its
        # partial walls in the recorded spread
        _SAMPLES[samples_key] = []
    wall = float("inf")
    for rep in range(1, repeats + 1):
        free1 = jax.tree_util.tree_map(
            lambda x: x * (1 + 1e-6 * rep), params.free0)
        t0 = time.perf_counter()
        kwargs, hist = fit(free1)    # steady state
        dt = time.perf_counter() - t0
        wall = min(wall, dt)
        if samples_key:
            _SAMPLES.setdefault(samples_key, []).append(round(dt, 3))

    modelled = np.asarray(model.model(kwargs))[:n_real]
    red_chi2 = float(np.nansum(
        (np.asarray(data)[:n_real] - modelled) ** 2
        / np.asarray(sigma_2)[:n_real]) / modelled.size)
    return wall, red_chi2, kwargs


def run_roi_cost(scene, n_iter=2000):
    """Driver-verifiable roofline evidence for the 1000-epoch ROI fit.

    XLA cost analysis ("bytes accessed" / flops) of ONE value_and_grad
    of the production loss — the per-iteration program of the AdaBelief
    loop.  Note: "bytes accessed" is XLA's static accounting and counts
    VMEM-resident reuse too, so implied GB/s can exceed physical HBM
    bandwidth; it is an upper bound on streamed bytes (BASELINE.md
    quotes the measured-roofline interpretation).
    """
    import jax
    from lightcurver_tpu.core.deconv.model import setup_model
    from lightcurver_tpu.core.deconv.loss import Loss
    from lightcurver_tpu.core.params import Params
    from lightcurver_tpu.utilities.benchmarking import compiled_cost

    model, kwargs_init, kwargs_up, kwargs_down, _ = setup_model(
        scene["data"], scene["sigma_2"], scene["psf"], scene["xs"],
        scene["ys"], scene["s"])
    params = Params(kwargs_init, {"kwargs_sersic": {}}, kwargs_up,
                    kwargs_down)
    loss = Loss(scene["data"], model, params, scene["sigma_2"],
                regularization_terms="l1_starlet",
                regularization_strength_scales=1.0,
                regularization_strength_hf=1.0,
                regularization_strength_positivity=100.0)
    vg_bytes, vg_flops = compiled_cost(
        jax.value_and_grad(loss.loss_fn), params.free0, loss.consts)
    return vg_bytes, vg_flops


def run_psf_bench(n_frames=16, n_stars=8, n_pix=64, s=2,
                  n_iter_analytic=100, n_iter_adabelief=3000,
                  repeats=3, samples_key=None, dft_pad=None):
    """Batched per-frame PSF fits; returns (fits/sec, mean chi2)."""
    from lightcurver_tpu.core.psf.batched import build_psf_batched
    from lightcurver_tpu.utilities.synthetic import make_star_stamps

    frames = [make_star_stamps(n_stars=n_stars, n_pix=n_pix, s=s, seed=i,
                               fwhm_x=2.4 + 0.1 * i, fwhm_y=2.4 + 0.1 * i)
              for i in range(n_frames)]
    data = np.stack([f["data"] for f in frames])
    sigma = np.stack([f["sigma"] for f in frames])

    def fit(d):
        # build_psf_batched fetches every output to numpy, which forces
        # completion (honest timing on the tunneled backend)
        return build_psf_batched(d, sigma, s,
                                 n_iter_analytic=n_iter_analytic,
                                 n_iter_adabelief=n_iter_adabelief,
                                 dft_pad=dft_pad)

    fit(data)                    # compile + first run
    # best-of-N (see run_roi_deconv: transient backend contention).
    # NOTE the wall includes the perturbation multiply + host->device
    # upload + result fetch: this is the PRODUCTION per-bucket cost
    # (the pipelined variant overlaps it), so fits/s is end-to-end
    if samples_key:
        _SAMPLES[samples_key] = []  # discard walls of crashed attempts
    wall = float("inf")
    for rep in range(1, repeats + 1):
        t0 = time.perf_counter()
        out = fit(data * np.float32(1 + 1e-6 * rep))
        dt = time.perf_counter() - t0
        wall = min(wall, dt)
        if samples_key:
            _SAMPLES.setdefault(samples_key, []).append(round(dt, 3))
    return n_frames / wall, float(out["chi2"].mean())


def run_star_photometry_bench(n_stars=8, n_epochs=50, n_pix=16, s=2,
                              n_iter=2000, repeats=3, samples_key=None):
    """Batched joint star photometry: stars fitted per second.

    The third hot task (reference processes/star_photometry.py:232 —
    one SERIAL 2000-AdaBelief fit per star, config.yaml:248): here all
    stars run as one vmapped compiled program, each jointly across its
    ``n_epochs`` epochs, with the exact GLS flux polish the production
    task applies (core/deconv/batched.fit_stars_batched).
    """
    from lightcurver_tpu.core.deconv.batched import fit_stars_batched
    from lightcurver_tpu.utilities.synthetic import make_star_stamps

    data, noise, psf = [], [], []
    for i in range(n_stars):
        st = make_star_stamps(n_stars=n_epochs, n_pix=n_pix, s=s,
                              seed=30 + i, fwhm_x=2.6, fwhm_y=2.6)
        data.append(st["data"])
        noise.append(st["sigma"])
        mp = st["psf_true"].shape[-1]
        psf.append(np.broadcast_to(st["psf_true"], (n_epochs, mp, mp)))
    data = np.stack(data)
    noise = np.stack(noise)
    psf = np.stack(psf)

    # fit_stars_batched fetches every output to numpy (honest timing)
    fit_stars_batched(data, noise, psf, s, n_iter=n_iter)  # compile
    if samples_key:
        _SAMPLES[samples_key] = []  # discard walls of crashed attempts
    wall = float("inf")
    for rep in range(1, repeats + 1):  # best-of-N (backend contention)
        t0 = time.perf_counter()
        out = fit_stars_batched(data * np.float32(1 + 1e-6 * rep),
                                noise, psf, s, n_iter=n_iter)
        dt = time.perf_counter() - t0
        wall = min(wall, dt)
        if samples_key:
            _SAMPLES.setdefault(samples_key, []).append(round(dt, 3))
    return n_stars / wall, float(np.mean(out["chi2"]))


def run_star_photometry_pipelined(n_buckets=3, n_stars=32, n_epochs=50,
                                  n_pix=16, s=2, n_iter=2000):
    """Bucketed star photometry with overlapped result fetch.

    Mirrors the pipelined PSF store (VERDICT r4 #8: the 8-star batch
    spends ~0.3 s of its 0.47 s wall outside the compiled loop —
    dispatch + device->host transfer on the tunneled backend): each
    bucket is dispatched with fetch="device" and the PREVIOUS bucket's
    results are materialized while the device runs, so the fixed
    per-bucket cost overlaps compute.
    """
    from lightcurver_tpu.core.deconv.batched import fit_stars_batched
    from lightcurver_tpu.utilities.synthetic import make_star_stamps

    data, noise, psf = [], [], []
    for i in range(n_stars):
        st = make_star_stamps(n_stars=n_epochs, n_pix=n_pix, s=s,
                              seed=60 + i, fwhm_x=2.6, fwhm_y=2.6)
        data.append(st["data"])
        noise.append(st["sigma"])
        mp = st["psf_true"].shape[-1]
        psf.append(np.broadcast_to(st["psf_true"], (n_epochs, mp, mp)))
    data, noise, psf = np.stack(data), np.stack(noise), np.stack(psf)

    fit_stars_batched(data, noise, psf, s, n_iter=n_iter)  # compile
    chi2s = []

    def fetch(out):
        chi2s.append(float(np.asarray(out["chi2"]).mean()))
        import jax

        jax.tree_util.tree_map(np.asarray, out)

    wall = float("inf")
    for rep in range(2):  # best-of-N (backend contention)
        t0 = time.perf_counter()
        in_flight = None
        for b in range(n_buckets):
            eps = np.float32(1 + 1e-6 * (rep * n_buckets + b + 1))
            out = fit_stars_batched(data * eps, noise, psf, s,
                                    n_iter=n_iter, fetch="device")
            if in_flight is not None:
                fetch(in_flight)
            in_flight = out
        fetch(in_flight)
        wall = min(wall, time.perf_counter() - t0)
    return n_buckets * n_stars / wall, float(np.mean(chi2s))


def run_psf_task_bench(n_frames=64, n_stars=8, n_pix=64, do_plots=False):
    """PRODUCTION-task PSF throughput (VERDICT r4 #3).

    Times ``processes.psf_modelling.model_all_psfs`` end-to-end — HDF5
    stamp reads, neighbour masking, vmapped two-phase fits at the full
    reference budget (100 L-BFGS + 3000 AdaBelief), pipelined
    device->host store, HDF5 PSF writes, DB rows (and the per-frame
    diagnostic plot when do_plots) — over a synthetic workdir at the
    bench stamp geometry.  The reference's 2-3 s/frame figure includes
    exactly this surrounding work (tutorial.md:273-274).

    Returns (fits/sec steady-state, mean chi2).  The first task run
    compiles + warms; the timed run re-fits everything via redo_psf.
    """
    import shutil
    import tempfile

    import yaml

    from lightcurver_tpu.utilities.synthetic import make_psf_task_workdir

    tmp = tempfile.mkdtemp(prefix="lc_psf_task_bench_")
    prev_cfg = os.environ.get("LIGHTCURVER_CONFIG")
    try:
        cfg_path = make_psf_task_workdir(
            tmp, n_frames=n_frames, n_stars=n_stars, n_pix=n_pix,
            config_overrides={"psf_do_plots": int(do_plots)})
        os.environ["LIGHTCURVER_CONFIG"] = str(cfg_path)
        from lightcurver_tpu.processes.psf_modelling import model_all_psfs
        from lightcurver_tpu.structure.database import \
            execute_sqlite_query

        model_all_psfs()          # cold: compile + first store
        # steady state: flip redo_psf so the task re-fits every frame
        with open(cfg_path) as f:
            cfg = yaml.safe_load(f)
        cfg["redo_psf"] = True
        cfg_path.write_text(yaml.dump(cfg))
        t0 = time.perf_counter()
        model_all_psfs()
        wall = time.perf_counter() - t0
        rows = execute_sqlite_query(
            "SELECT chi2 FROM PSFs", use_pandas=True)
        assert len(rows) == n_frames, (len(rows), n_frames)
        return n_frames / wall, float(rows["chi2"].mean())
    finally:
        if prev_cfg is None:
            os.environ.pop("LIGHTCURVER_CONFIG", None)
        else:
            os.environ["LIGHTCURVER_CONFIG"] = prev_cfg
        shutil.rmtree(tmp, ignore_errors=True)


def run_cpu_lane():
    """Same-box CPU reference lane (VERDICT r4 #2): the driver-visible
    anchor for the ">= 50x single-CPU lightcurver" north star.

    Runs THIS repo's own fits on the host CPU at the full reference
    budgets — a conservative proxy for "single-CPU lightcurver" (the
    reference's STARRED/scipy path does strictly more work per
    iteration than this repo's MXU-shaped render pipeline, and its own
    docs call CPU use "excruciatingly slow", tutorial.md:63).  Tiny
    frame/star counts keep the lane affordable; per-fit cost on one
    core is additive across fits (vmap on CPU is a loop), so fits/sec
    extrapolates by count.  The ROI fit extrapolates the 2000-iteration
    budget from a two-point iteration sweep (fixed overhead removed by
    differencing).  Runs in a SUBPROCESS of bench.py (--cpu-lane):
    the parent may hold the TPU client, and jax backends are
    process-global.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    # CPU-feature-keyed persistent cache (same scheme as
    # tests/conftest.py): compiles dominate the lane's first run
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next(line for line in f if line.startswith("flags"))
    except (OSError, StopIteration):
        flags = "unknown"
    fp = hashlib.sha256(flags.encode()).hexdigest()[:8]
    cache = pathlib.Path(__file__).parent / f".jax_cache_cpu_{fp}"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    out = {"cpu_lane": True, "backend": jax.default_backend()}

    # PSF: 2 frames at the FULL reference budget (100 + 3000)
    fps, chi2 = run_psf_bench(n_frames=2, n_stars=8, n_pix=64, s=2,
                              n_iter_analytic=100, n_iter_adabelief=3000,
                              repeats=1, dft_pad=16)
    out["psf_cpu_fits_per_sec"] = round(fps, 4)
    out["psf_cpu_chi2"] = round(chi2, 4)
    print(json.dumps(out), flush=True)

    # star photometry: 2 stars x 50 epochs at the full 2000-iter budget
    sfps, schi2 = run_star_photometry_bench(n_stars=2, n_epochs=50,
                                            n_pix=16, s=2, n_iter=2000,
                                            repeats=1)
    out["star_cpu_fits_per_sec"] = round(sfps, 4)
    out["star_cpu_chi2"] = round(schi2, 4)
    print(json.dumps(out), flush=True)

    # ROI 100-epoch: two-point iteration sweep -> full-budget wall
    from lightcurver_tpu.utilities.synthetic import make_roi_scene

    scene = make_roi_scene(n_epochs=100, n_pix=64, s=2, n_sources=4)
    w150, _, _ = run_roi_deconv(scene, n_iter=150, repeats=1)
    w450, _, _ = run_roi_deconv(scene, n_iter=450, repeats=1)
    per_iter = max((w450 - w150) / 300.0, 0.0)
    out["roi100_cpu_wall_s"] = round(w150 + per_iter * 1850.0, 2)
    out["roi100_cpu_ms_per_iter"] = round(per_iter * 1e3, 2)
    print(json.dumps(out), flush=True)
    return out


def _cpu_lane_subprocess(timeout_s=None):
    """Run the CPU reference lane in a fresh process; dict or None."""
    import subprocess
    import sys

    if timeout_s is None:
        timeout_s = float(os.environ.get("LIGHTCURVER_BENCH_CPU_LANE_S",
                                         900))
    if timeout_s <= 0:
        return None
    env = dict(os.environ, LIGHTCURVER_BENCH_NO_PROBE="1",
               JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--cpu-lane"], timeout=timeout_s,
                       capture_output=True, text=True, env=env)
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        print(f"# cpu lane rc={r.returncode}: "
              f"{(r.stderr or r.stdout)[-300:]}", flush=True)
        return None
    # last line carries the union of everything that completed
    return json.loads(lines[-1])


# v5e ICI projection assumptions (documented for the driver): effective
# all-reduce bandwidth per chip and per-step launch latency.  The
# payload itself is MEASURED from the compiled sharded HLO
# (tools/sharded_overhead.py, epoch-independent).
ICI_EFFECTIVE_GBPS = 45.0
ICI_STEP_LATENCY_S = 5e-6


def project_8chip_wall(wall_1chip_s, n_iter=2000, payload_mb=0.264,
                       n_chips=8):
    """Idealized v5e-8 projection of an epoch-sharded ROI fit.

    compute/8 + per-step collective: the fit's FLOPs and HBM bytes are
    epoch-proportional and epochs shard exactly (pad_epoch_stacks), so
    compute scales 1/N; the only cross-chip traffic is the measured
    ~0.264 MB/step all-reduce of the shared h/c gradients
    (epoch-count-independent, tests/test_parallel.py).  Assumptions
    documented at ICI_EFFECTIVE_GBPS / ICI_STEP_LATENCY_S; the
    single-chip wall already contains the non-scaling dispatch + GLS
    polish + fetch tail, so keeping it un-split makes the projection
    conservative.
    """
    collective = n_iter * (payload_mb * 1e6 / (ICI_EFFECTIVE_GBPS * 1e9)
                           + ICI_STEP_LATENCY_S)
    return wall_1chip_s / n_chips + collective


def run_psf_bench_pipelined(n_buckets=3, n_frames=16, n_stars=8,
                            n_pix=64, s=2, n_iter_analytic=100,
                            n_iter_adabelief=3000, dft_pad=16):
    """Production-loop PSF throughput: buckets pipelined.

    Mirrors processes/psf_modelling.model_all_psfs: each bucket's fit
    is dispatched asynchronously (fetch="device") and the previous
    bucket's results are materialized while the device computes — the
    device->host transfer (0.3-0.5 s/bucket on the tunneled bench
    backend) overlaps compute instead of serializing with it.
    """
    import jax
    from lightcurver_tpu.core.psf.batched import build_psf_batched
    from lightcurver_tpu.utilities.synthetic import make_star_stamps

    frames = [make_star_stamps(n_stars=n_stars, n_pix=n_pix, s=s, seed=i,
                               fwhm_x=2.4 + 0.1 * i, fwhm_y=2.4 + 0.1 * i)
              for i in range(n_frames)]
    data = np.stack([f["data"] for f in frames])
    sigma = np.stack([f["sigma"] for f in frames])
    kw = dict(n_iter_analytic=n_iter_analytic,
              n_iter_adabelief=n_iter_adabelief, dft_pad=dft_pad)

    build_psf_batched(data, sigma, s, **kw)     # compile + warm
    chi2s = []

    def fetch(out):
        chi2s.append(float(np.asarray(out["chi2"]).mean()))
        jax.tree_util.tree_map(np.asarray, out)

    # best-of-N (see run_roi_deconv: transient backend contention)
    wall = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        in_flight = None
        for b in range(n_buckets):
            eps = 1e-6 * (rep * n_buckets + b + 1)
            out = build_psf_batched(data * np.float32(1 + eps),
                                    sigma, s, fetch="device", **kw)
            if in_flight is not None:
                fetch(in_flight)
            in_flight = out
        fetch(in_flight)
        wall = min(wall, time.perf_counter() - t0)
    return n_buckets * n_frames / wall, float(np.mean(chi2s))


def _retry(fn, what, attempts=3):
    for attempt in range(attempts):  # the backend throws transient errors
        try:
            return fn()
        except Exception as e:       # noqa: BLE001
            if attempt == attempts - 1:
                raise
            print(f"# {what} attempt {attempt} failed: {e}", flush=True)


def run_starlet_micro(n_rep=200, m=128):
    """Standalone starlet forward: XLA vs the Pallas kernel (seconds)."""
    import jax.numpy as jnp
    from lightcurver_tpu.core.starlet import (starlet_transform,
                                              n_starlet_scales)
    from lightcurver_tpu.utilities.benchmarking import time_compiled_loop

    n_sc = n_starlet_scales(m)
    img = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (m, m)).astype(np.float32))

    t_xla = time_compiled_loop(
        lambda x: starlet_transform(x, n_scales=n_sc), img, n_rep)
    try:
        from lightcurver_tpu.ops.starlet_pallas import \
            starlet_transform_pallas

        t_pal = time_compiled_loop(
            lambda x: starlet_transform_pallas(x, n_scales=n_sc), img,
            n_rep)
    except Exception as e:  # noqa: BLE001 — pallas unsupported backends
        print(f"# pallas starlet unavailable: {e}", flush=True)
        t_pal = float("nan")
    return t_xla, t_pal


def run_cosmics_micro(n=32, repeats=10):
    """Host-preproc micro-bench: C++ L.A.Cosmic vs the scipy twin at the
    production ROI stamp size (they are bit-exact; see
    tests/test_processes.py::TestCosmics).  Returns (native_ms, scipy_ms);
    native_ms is NaN when the toolchain is unavailable."""
    import numpy as np
    from lightcurver_tpu import native
    from lightcurver_tpu.processes.cosmics import detect_cosmics_numpy
    rng = np.random.default_rng(0)
    img = rng.normal(100.0, 5.0, (n, n))
    img[n // 2, n // 2] += 4000.0
    var = np.abs(img) + 25.0
    t_py = min(_time_host(lambda: detect_cosmics_numpy(img, invar=var),
                          repeats))
    if native.load() is None:
        return float("nan"), t_py * 1e3
    t_cc = min(_time_host(lambda: native.detect_cosmics(img, invar=var),
                          repeats))
    return t_cc * 1e3, t_py * 1e3


def _time_host(fn, repeats):
    import time
    samples = []
    fn()  # warm (first native call may compile the .so)
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return samples


def _optional(fn, what, default):
    """Extras must never kill the primary JSON line the driver records."""
    try:
        return _retry(fn, what)
    except Exception as e:  # noqa: BLE001
        print(f"# optional metric {what} failed: {e}", flush=True)
        return default


def run_sharded_overhead():
    """Sharded-vs-unsharded ROI step efficiency (VERDICT r3 #4).

    Runs tools/sharded_overhead.py in a fresh subprocess on a virtual
    8-device CPU mesh (the bench box has ONE real chip, so sharding
    efficiency can only be measured against virtual devices) and
    returns its JSON dict, or None.
    """
    import subprocess
    import sys

    tool = pathlib.Path(__file__).parent / "tools" / "sharded_overhead.py"
    r = subprocess.run([sys.executable, str(tool)], timeout=600,
                       capture_output=True, text=True)
    if r.returncode != 0:
        print(f"# sharded_overhead rc={r.returncode}: "
              f"{(r.stderr or r.stdout)[-300:]}", flush=True)
        return None
    return json.loads(r.stdout.strip().splitlines()[-1])


def _degraded_lane(watchdog):
    """Wedged-tunnel fallback: tiny CPU workloads under DISTINCT keys.

    A BENCH_r*.json carrying "backend_fallback" documents an
    unreachable accelerator at record time, NOT a regression — the
    headline keys stay null so a degraded capture can never be read as
    a throughput number.  Workloads are sized to THIS 1-core box
    (measured 2026-08-19: roi 20ep/32px/500it = 66 s incl. compile,
    psf 2f/32px = 90 s, star 2x20/500it = 17 s — ~3 min total), so the
    line completes far inside the watchdog deadline.
    """
    from lightcurver_tpu.utilities.synthetic import make_roi_scene

    nan = float("nan")
    scene = make_roi_scene(n_epochs=20, n_pix=32, s=2, n_sources=4)
    roi_wall, red_chi2, _ = _retry(
        lambda: run_roi_deconv(scene, n_iter=500, repeats=1,
                               samples_key="roi20_degraded"),
        "roi20deg")
    _put(roi_deconv_degraded_20epoch_wall_s=round(roi_wall, 3),
         roi_degraded_reduced_chi2=round(red_chi2, 4))

    fps, psf_chi2 = _optional(
        lambda: run_psf_bench(n_frames=2, n_stars=4, n_pix=32,
                              n_iter_analytic=50, n_iter_adabelief=500,
                              repeats=1, dft_pad=16,
                              samples_key="psf2_degraded"),
        "psf2deg", (nan, nan))
    _put(psf_fits_per_sec_degraded_small=round(fps, 3),
         psf_chi2_degraded=round(psf_chi2, 4))

    star_fps, star_chi2 = _optional(
        lambda: run_star_photometry_bench(
            n_stars=2, n_epochs=20, n_iter=500, repeats=1,
            samples_key="star2_degraded"),
        "star2deg", (nan, nan))
    _put(star_fits_per_sec_degraded_small=round(star_fps, 3),
         star_phot_chi2_degraded=round(star_chi2, 4))

    cc_ms, py_ms = _optional(lambda: run_cosmics_micro(), "cosmics",
                             (nan, nan))
    _put(cosmics_native_ms=round(cc_ms, 3),
         cosmics_scipy_ms=round(py_ms, 3))
    _recovery_handoff(watchdog)
    watchdog.cancel()
    _emit()


def _recovery_handoff(watchdog=None):
    """Re-probe a wedged tunnel and hand off to a full TPU run.

    Measured 2026-08-19 19:42-19:48: the tunnel wedged for ~3 minutes
    between two healthy checks — a one-shot probe verdict can strand a
    whole round's numbers in the degraded lane over a TRANSIENT stall.
    After the degraded metrics are safely emitted, keep probing (every
    ~45 s, within LIGHTCURVER_BENCH_RECOVER_S of wall); on the first
    healthy probe, re-run bench.py in a child process (probe disabled)
    and merge every JSON line the child prints into THIS process's
    snapshot, so each emitted line carries the union of degraded +
    recovered metrics and the driver's last-line parse can never lose
    either.  The wedged client cannot recover in-process — the child
    gets a fresh PJRT plugin.
    """
    import subprocess
    import sys
    import time as _time

    # default raised 480 -> 1500 (round 5): measured 2026-08-21 the
    # tunnel's busy windows (another tenant holding the single-client
    # chip) span tens of minutes, not the ~3-minute transient the 480 s
    # window was sized for.  A longer wait is free in information
    # terms: the degraded snapshot is already emitted (last-line-wins),
    # so a driver kill during the wait loses nothing.
    budget = float(os.environ.get("LIGHTCURVER_BENCH_RECOVER_S", 1500))
    if budget <= 0 or os.environ.get("LIGHTCURVER_BENCH_CHILD") == "1":
        return
    interval = float(os.environ.get("LIGHTCURVER_BENCH_REPROBE_INTERVAL_S",
                                    45))
    t0 = _time.time()
    recovered = False
    while _time.time() - t0 < budget:
        _time.sleep(interval)
        print(f"# re-probing backend ({_time.time() - t0:.0f}s "
              "after degraded lane)", flush=True)
        reprobe_s = os.environ.get("LIGHTCURVER_BENCH_REPROBE_S")
        if _probe_backend(None if reprobe_s is None else float(reprobe_s)):
            recovered = True
            break
    if not recovered:
        _put(recover_probe_window_s=round(_time.time() - t0, 0))
        return
    wait_s = round(_time.time() - t0, 0)
    env = dict(os.environ,
               LIGHTCURVER_BENCH_NO_PROBE="1",
               LIGHTCURVER_BENCH_CHILD="1")
    # the child arms its own watchdog; bound it by what remains of a
    # typical driver budget rather than the full default
    env.setdefault("LIGHTCURVER_BENCH_DEADLINE_S", "1500")
    print("# tunnel recovered: handing off to a full run", flush=True)
    # the child arms its own watchdog against a re-wedge; the parent's
    # (armed ~degraded-lane ago) must not cut the stream mid-child
    if watchdog is not None:
        watchdog.cancel()
    # test hook: the suite substitutes a tiny child that prints canned
    # JSON lines (tests/test_bench_recovery.py)
    cmd_override = os.environ.get("LIGHTCURVER_BENCH_CHILD_CMD")
    cmd = ([sys.executable, "-c", cmd_override] if cmd_override
           else [sys.executable, os.path.abspath(__file__)])
    with subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True,
                          env=env) as child:
        for line in child.stdout:
            line = line.rstrip("\n")
            if not line.startswith("{"):
                print(line, flush=True)
                continue
            try:
                snap = json.loads(line)
            except ValueError:
                print(line, flush=True)
                continue
            _SAMPLES.update(snap.pop("wall_samples", {}) or {})
            # child keys overwrite (it measured the real backend);
            # degraded keys are distinct and survive the merge
            _METRICS.update({k: v for k, v in snap.items()
                             if v is not None or k not in _METRICS})
            _METRICS["probe_wedged_then_recovered_after_s"] = wait_s
            _METRICS.pop("backend_fallback", None)
            _emit()


def main():
    watchdog = _start_watchdog()
    jax = _setup_jax()
    from lightcurver_tpu import ops
    from lightcurver_tpu.utilities.synthetic import make_roi_scene

    nan = float("nan")
    baseline_roi_s = 180.0  # reference: "a few minutes at least" on CPU
    baseline_psf_fps = 1.0 / 2.5  # reference: 2-3 s/frame on a GPU
    _put(backend=jax.default_backend(), n_devices=jax.device_count(),
         starlet_backend_selected=ops.get_backend())

    if "backend_fallback" in _METRICS:
        _degraded_lane(watchdog)
        return

    # headline: 100-epoch joint ROI deconvolution, full 2000-iter budget
    scene = make_roi_scene(n_epochs=100, n_pix=64, s=2, n_sources=4)
    roi_wall, red_chi2, _ = _retry(
        lambda: run_roi_deconv(scene, repeats=2, samples_key="roi100"),
        "roi100")
    _put(metric="roi_deconv_100epoch_wall_s", value=round(roi_wall, 3),
         unit="s", vs_baseline=round(baseline_roi_s / roi_wall, 2),
         roi_reduced_chi2=round(red_chi2, 4))

    # PSF throughput SECOND (VERDICT r3: round-3's tail keys never
    # reached a driver capture — record the headline trio before
    # anything optional)
    # dft_pad=16 is the PRODUCTION default since round 4
    # (structure/user_config.py): the headline measures what the
    # pipeline ships.  The full-padding lane keeps its own key below
    # for continuity with rounds 1-3.
    fits_per_sec, psf_chi2 = _retry(
        lambda: run_psf_bench(n_frames=16, repeats=3, dft_pad=16,
                              samples_key="psf16"), "psf16")
    # wall/iterations upper bound: folds the 0.1 s L-BFGS phase +
    # prep/fetch overhead into the AdaBelief per-iter figure
    _put(psf_fits_per_sec=round(fits_per_sec, 3),
         psf_chi2=round(psf_chi2, 4),
         psf_fits_per_sec_vs_baseline=round(
             fits_per_sec / baseline_psf_fps, 2),
         psf_ms_per_iter_upper=round(
             (16.0 / fits_per_sec) * 1e3 / 3100, 4))

    # full-padding A/B lane: L = 2m exact-for-any-placement padding,
    # the rounds-1-3 headline configuration (the production default is
    # now dft_pad=16 — star positions are centre-pinned, so the
    # reduced padding's model cost is <= 1.8e-5 relative flux,
    # float64-quantified in tools/exp_psf_mxu.py)
    fps_full, chi2_full = _optional(
        lambda: run_psf_bench(dft_pad=None, samples_key="psf16full"),
        "psffull", (nan, nan))
    _put(psf_fits_per_sec_fullpad=round(fps_full, 3),
         psf_chi2_fullpad=round(chi2_full, 4))

    # the third hot task: batched joint star photometry (stars/s at
    # the reference's 2000-iteration per-star budget, 50 epochs each)
    star_fps, star_chi2 = _optional(
        lambda: run_star_photometry_bench(n_stars=8, repeats=3,
                                          samples_key="star8"),
        "starphot", (nan, nan))
    _put(star_fits_per_sec=round(star_fps, 3),
         star_phot_chi2=round(star_chi2, 4),
         star_fits_per_sec_batch8=round(star_fps, 3))
    if star_fps == star_fps:
        _put(star_ms_per_iter_upper=round(
            (8.0 / star_fps) * 1e3 / 2000, 4))

    # star-batch amortization curve (VERDICT r4 #8: the ~0.3 s fixed
    # prep/dispatch/fetch per batch must amortize at production batch
    # sizes — target batch-128 >= 2x batch-8 stars/s)
    for bs in (32, 128):
        sfps, _ = _optional(
            lambda b=bs: run_star_photometry_bench(
                n_stars=b, repeats=2, samples_key=f"star{b}"),
            f"star{bs}", (nan, None))
        _put(**{f"star_fits_per_sec_batch{bs}": round(sfps, 3)})

    # bucketed star photometry with the fetch overlapped (the
    # pipelined-store pattern applied to the star task)
    sfps_pipe, _ = _optional(
        lambda: run_star_photometry_pipelined(), "starpipe", (nan, nan))
    _put(star_fits_per_sec_pipelined=round(sfps_pipe, 3))

    # PRODUCTION-task PSF throughput (VERDICT r4 #3): model_all_psfs
    # end-to-end over 64 synthetic frames — HDF5 reads, host masking,
    # full-budget vmapped fits, pipelined store, HDF5+DB writes
    task_fps, task_chi2 = _optional(
        lambda: run_psf_task_bench(n_frames=64), "psftask", (nan, nan))
    _put(psf_task_fits_per_sec=round(task_fps, 3),
         psf_task_chi2=round(task_chi2, 4))
    # plots counted separately (host matplotlib; the reference's
    # 2-3 s/frame includes them)
    task_fps_plots, _ = _optional(
        lambda: run_psf_task_bench(n_frames=16, do_plots=True),
        "psftaskplots", (nan, nan))
    _put(psf_task_with_plots_fits_per_sec=round(task_fps_plots, 3))

    # host-preprocessing evidence: the C++ cosmic-ray kernel vs its
    # bit-exact scipy twin (pure host CPU — immune to tunnel state)
    cosmics_cc_ms, cosmics_py_ms = _optional(
        lambda: run_cosmics_micro(), "cosmics", (nan, nan))
    _put(cosmics_native_ms=round(cosmics_cc_ms, 3),
         cosmics_scipy_ms=round(cosmics_py_ms, 3))

    # the flagship survey-scale configuration (BASELINE.json north star:
    # 1000 epochs < 60 s on v5e-8; epoch-sharded when devices allow)
    scene1000 = make_roi_scene(n_epochs=1000, n_pix=64, s=2, n_sources=4)
    roi1000_wall, roi1000_chi2, _ = _optional(
        lambda: run_roi_deconv(scene1000, samples_key="roi1000"),
        "roi1000", (nan, nan, None))
    _put(roi_deconv_1000epoch_wall_s=round(roi1000_wall, 3),
         roi_1000epoch_reduced_chi2=round(roi1000_chi2, 4),
         # wall/iterations: GLS polish + host fetch folded in — an
         # UPPER bound like the psf/star per-iter figures
         roi1000_ms_per_iter=round(roi1000_wall * 1e3 / 2000, 3))
    if roi1000_wall == roi1000_wall:
        # explicit v5e-8 projection (VERDICT r4 #4): measured 1-chip
        # wall / 8 + the measured 0.264 MB/step structural all-reduce
        # at documented ICI assumptions; recomputed below with the
        # round's own payload measurement when the sharded lane runs
        _put(roi1000_projected_8chip_s=round(
            project_8chip_wall(roi1000_wall), 3))

    # accelerated budget: the model is linear in the fluxes, so a short
    # AdaBelief run for positions/background + the exact GLS flux
    # polish reaches the SAME chi2 as the full reference budget.
    # Measured sweep: 250 iters + polish (chi2 1.0041, 1.6 s) already
    # beats 2000 iters unpolished (1.0056); the SHIPPED metric runs 500
    # iters (~3.2 s) as margin for harder position/background starts.
    accel_wall, accel_chi2, _ = _optional(
        lambda: run_roi_deconv(scene1000, n_iter=500),
        "roi1000accel", (nan, nan, None))
    _put(roi_deconv_1000epoch_accel_wall_s=round(accel_wall, 3),
         roi_1000epoch_accel_reduced_chi2=round(accel_chi2, 4))

    # the production-loop throughput (pipelined buckets, the
    # model_all_psfs pattern) — transfers overlap device compute
    fits_pipelined, _ = _optional(
        lambda: run_psf_bench_pipelined(), "psfpipe", (nan, nan))
    _put(psf_fits_per_sec_pipelined=round(fits_pipelined, 3))

    # roofline evidence (VERDICT r2 #4): per-iteration XLA cost of the
    # hot fits, driver-verifiable each round
    from lightcurver_tpu.utilities.benchmarking import (
        psf_pixel_phase_cost, star_fit_phase_cost)

    roi_vg = _optional(lambda: run_roi_cost(scene1000), "roi1000cost",
                       (nan, nan))
    implied = nan
    if roi_vg[0] == roi_vg[0] and roi1000_wall == roi1000_wall:
        # PER-CHIP: the cost analysis lowers the UNSHARDED program
        # (total bytes) while the wall is epoch-sharded over
        # device_count chips, each streaming ~bytes/N — without the /N
        # a multi-chip run would report an N-chip aggregate against
        # the single chip's ~526 GB/s roofline
        implied = round(roi_vg[0] / jax.device_count()
                        / (roi1000_wall / 2000) / 1e9, 1)
    _put(roi1000_vg_bytes_per_iter=roi_vg[0],
         roi1000_implied_gbps_per_chip=implied)
    psf_vg = _optional(lambda: psf_pixel_phase_cost(16, 8, 64, 2)[0],
                       "psfcost", (nan, nan))
    star_vg = _optional(lambda: star_fit_phase_cost(8, 50, 16, 2)[0],
                        "starcost", (nan, nan))
    _put(psf_pixel_vg_bytes_per_iter=psf_vg[0],
         star_vg_bytes_per_iter=star_vg[0])

    # vmap amortization curve (fits/sec at batch 1 / 32, full budget;
    # 16 is the headline above — throughput peaks there, batch 64
    # measured slower)
    for bs in (1, 32):
        fps, _ = _optional(
            lambda b=bs: run_psf_bench(n_frames=b, dft_pad=16),
            f"psf{bs}", (nan, None))
        _put(**{f"psf_fits_per_sec_batch{bs}": round(fps, 3)})

    # starlet backend measurement (the Pallas kernel wins standalone but
    # not inside the fused losses; auto_select keeps 'xla' — see
    # ops/starlet_op.py)
    t_xla, t_pal = _optional(lambda: run_starlet_micro(), "starlet",
                             (nan, nan))
    _put(starlet_xla_us=round(t_xla * 1e6, 1),
         starlet_pallas_us=round(t_pal * 1e6, 1))

    # same-box CPU reference lane (VERDICT r4 #2): ">= 50x single-CPU"
    # made driver-verifiable.  Fresh subprocess: backends are
    # process-global and the parent holds the TPU client.
    cpu = _optional(lambda: _cpu_lane_subprocess(), "cpulane", None)
    if cpu:
        _put(**{k: v for k, v in cpu.items()
                if k.endswith(("_cpu_fits_per_sec", "_cpu_wall_s",
                               "_cpu_ms_per_iter", "_cpu_chi2"))})
        pc = cpu.get("psf_cpu_fits_per_sec")
        if pc and fits_per_sec == fits_per_sec:
            _put(psf_fits_per_sec_vs_cpu=round(fits_per_sec / pc, 1))
        sc = cpu.get("star_cpu_fits_per_sec")
        if sc and star_fps == star_fps:
            _put(star_fits_per_sec_vs_cpu=round(star_fps / sc, 1))
        rc = cpu.get("roi100_cpu_wall_s")
        if rc and roi_wall == roi_wall:
            _put(roi100_vs_cpu=round(rc / roi_wall, 1))

    # sharded-step efficiency on a virtual 8-device CPU mesh (fresh
    # subprocess — the bench box has one real chip)
    sh = _optional(lambda: run_sharded_overhead(), "shardedoverhead",
                   None)
    if sh:
        _put(**{k: v for k, v in sh.items()
                if k.startswith("roi_sharded")})
        payload = sh.get("roi_sharded_allreduce_mb_per_step")
        if payload and roi1000_wall == roi1000_wall:
            # projection refreshed with THIS round's measured payload
            _put(roi1000_projected_8chip_s=round(
                project_8chip_wall(roi1000_wall, payload_mb=payload), 3))

    watchdog.cancel()
    _emit()


def run_config(n):
    """The five BASELINE.json benchmark configurations.

    1. single-epoch Moffat PSF fits, 5 frames of 64x64 stamps
    2. full narrow-PSF model per frame, 100 frames
    3. joint photometry of 10 stars x 100 epochs
    4. 100-epoch joint ROI deconvolution (the headline, = main())
    5. survey scale: 1000-epoch joint deconvolution
    """
    watchdog = _start_watchdog()
    # a watchdog line must name THIS config's metric, not main()'s
    _METRICS.update({"config": n, "metric": {
        1: "moffat_fits_per_sec", 2: "psf_fits_per_sec_96frames",
        3: "joint_photometry_10stars_100epochs_wall_s",
        4: "roi_deconv_100epoch_wall_s",
        5: "roi_deconv_1000epoch_wall_s"}.get(n, f"config_{n}")})
    jax = _setup_jax()
    from lightcurver_tpu.utilities.synthetic import (make_roi_scene,
                                                     make_star_stamps)

    if n == 1:
        fps, chi2 = run_psf_bench(n_frames=5, n_stars=1, n_pix=64,
                                  n_iter_analytic=100, n_iter_adabelief=0,
                                  dft_pad=16)
        out = {"config": 1, "metric": "moffat_fits_per_sec", "value": fps,
               "chi2": chi2}
    elif n == 2:
        # 96 frames in 16-frame buckets: one compile, six executions
        from lightcurver_tpu.core.psf.batched import build_psf_batched

        frames = [make_star_stamps(n_stars=8, n_pix=64, s=2, seed=i,
                                   fwhm_x=2.4 + 0.02 * i,
                                   fwhm_y=2.4 + 0.02 * i)
                  for i in range(16)]
        data = np.stack([f["data"] for f in frames])
        sigma = np.stack([f["sigma"] for f in frames])
        build_psf_batched(data, sigma, 2, dft_pad=16)  # compile
        t0 = time.perf_counter()
        chi2s = []
        for chunk in range(6):
            out_c = build_psf_batched(
                data * np.float32(1 + 1e-6 * (chunk + 1)), sigma, 2,
                dft_pad=16)
            chi2s.append(out_c["chi2"].mean())
        wall = time.perf_counter() - t0
        out = {"config": 2, "metric": "psf_fits_per_sec_96frames",
               "value": 96 / wall, "chi2": float(np.mean(chi2s))}
    elif n == 3:
        from lightcurver_tpu.core.deconv.batched import fit_stars_batched

        stars = [make_star_stamps(n_stars=100, n_pix=24, s=2, seed=i)
                 for i in range(10)]
        data = np.stack([s["data"] for s in stars])
        noise = np.stack([s["sigma"] for s in stars])
        m = stars[0]["psf_true"].shape[-1]
        psf = np.stack([np.broadcast_to(s["psf_true"], (100, m, m))
                        for s in stars])
        fit_stars_batched(data, noise, psf, 2, n_iter=2000)  # compile
        t0 = time.perf_counter()
        res = fit_stars_batched(data * np.float32(1 + 1e-6), noise, psf,
                                2, n_iter=2000)
        wall = time.perf_counter() - t0
        out = {"config": 3,
               "metric": "joint_photometry_10stars_100epochs_wall_s",
               "value": wall, "chi2": float(res["chi2"].mean())}
    elif n == 4:
        scene = make_roi_scene(n_epochs=100)
        wall, chi2, _ = run_roi_deconv(scene)
        out = {"config": 4, "metric": "roi_deconv_100epoch_wall_s",
               "value": wall, "chi2": chi2}
    elif n == 5:
        scene = make_roi_scene(n_epochs=1000)
        wall, chi2, _ = run_roi_deconv(scene)
        out = {"config": 5, "metric": "roi_deconv_1000epoch_wall_s",
               "value": wall, "chi2": chi2}
    else:
        raise SystemExit(f"unknown config {n}")
    out["backend"] = jax.default_backend()
    if "backend_fallback" in _METRICS:
        out["backend_fallback"] = _METRICS["backend_fallback"]
    watchdog.cancel()
    print(json.dumps(out))


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "--cpu-lane":
        run_cpu_lane()
    elif len(sys.argv) > 1:
        run_config(int(sys.argv[1]))
    else:
        main()
