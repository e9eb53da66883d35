"""bench.py wedged-tunnel recovery handoff.

Measured 2026-08-19 19:42-19:48 UTC: the shared TPU tunnel wedged for
~3 minutes between two healthy checks.  A one-shot probe verdict at the
wrong minute would strand a whole round's numbers in the degraded CPU
lane, so after the degraded metrics are emitted bench.py re-probes and,
on recovery, re-runs itself with the probe disabled, merging the
child's incremental JSON lines into its own snapshot (the driver parses
the LAST line of stdout — every emitted line must carry the union).

These tests drive _recovery_handoff with a canned child process and a
monkeypatched probe; no accelerator or real benchmark work is involved.
"""

import importlib.util
import json
import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


@pytest.fixture()
def bench(monkeypatch):
    """A fresh bench module instance (module-level _METRICS is stateful)."""
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    monkeypatch.setitem(sys.modules, "bench_under_test", mod)
    spec.loader.exec_module(mod)
    monkeypatch.setenv("LIGHTCURVER_BENCH_REPROBE_INTERVAL_S", "0")
    monkeypatch.delenv("LIGHTCURVER_BENCH_CHILD", raising=False)
    return mod


def _last_json(capsys):
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert lines, "no JSON line emitted"
    return json.loads(lines[-1])


def test_merges_child_lines_and_keeps_degraded_keys(bench, monkeypatch,
                                                    capsys):
    """On recovery, child TPU metrics and parent degraded keys coexist."""
    bench._METRICS.update({
        "backend": "cpu",
        "backend_fallback": "cpu (default backend probe hung)",
        "roi_deconv_degraded_20epoch_wall_s": 2.9,
    })
    child = (
        "import json;"
        "print(json.dumps({'metric': 'roi_deconv_100epoch_wall_s',"
        " 'value': None, 'backend': 'tpu', 'wall_samples': {}}));"
        "print(json.dumps({'metric': 'roi_deconv_100epoch_wall_s',"
        " 'value': 0.75, 'backend': 'tpu', 'psf_fits_per_sec': 9.2,"
        " 'wall_samples': {'roi100': [0.75, 0.8]}}))"
    )
    monkeypatch.setenv("LIGHTCURVER_BENCH_CHILD_CMD", child)
    monkeypatch.setenv("LIGHTCURVER_BENCH_RECOVER_S", "30")
    monkeypatch.setattr(bench, "_probe_backend", lambda deadline=None: True)

    bench._recovery_handoff()
    out = _last_json(capsys)
    # child headline keys landed
    assert out["value"] == 0.75
    assert out["psf_fits_per_sec"] == 9.2
    assert out["backend"] == "tpu"
    assert out["wall_samples"]["roi100"] == [0.75, 0.8]
    # parent degraded evidence survives; the fallback flag is replaced
    # by the recovery marker
    assert out["roi_deconv_degraded_20epoch_wall_s"] == 2.9
    assert "backend_fallback" not in out
    assert out["probe_wedged_then_recovered_after_s"] >= 0


def test_child_nulls_do_not_clobber_parent_values(bench, monkeypatch,
                                                  capsys):
    """A child killed before a metric completes must not erase keys."""
    bench._METRICS.update({
        "backend_fallback": "cpu (default backend probe hung)",
        "roi_deconv_degraded_20epoch_wall_s": 2.9,
    })
    child = ("import json;"
             "print(json.dumps({'metric': 'roi_deconv_100epoch_wall_s',"
             " 'value': None, 'backend': 'tpu', 'wall_samples': {}}))")
    monkeypatch.setenv("LIGHTCURVER_BENCH_CHILD_CMD", child)
    monkeypatch.setenv("LIGHTCURVER_BENCH_RECOVER_S", "30")
    monkeypatch.setattr(bench, "_probe_backend", lambda deadline=None: True)

    bench._recovery_handoff()
    out = _last_json(capsys)
    assert out["roi_deconv_degraded_20epoch_wall_s"] == 2.9
    assert out["value"] is None  # child never completed the headline


def test_no_recovery_records_probe_window(bench, monkeypatch, capsys):
    """If the tunnel stays wedged, the line documents the probe window."""
    monkeypatch.setenv("LIGHTCURVER_BENCH_RECOVER_S", "0.2")
    monkeypatch.setattr(bench, "_probe_backend", lambda deadline=None: False)
    bench._METRICS["roi_deconv_degraded_20epoch_wall_s"] = 2.9
    bench._recovery_handoff()
    out = _last_json(capsys)
    assert out["recover_probe_window_s"] >= 0
    assert out["roi_deconv_degraded_20epoch_wall_s"] == 2.9


def test_child_process_skips_recovery(bench, monkeypatch, capsys):
    """The NO-recursion guard: a child never spawns grandchildren."""
    monkeypatch.setenv("LIGHTCURVER_BENCH_CHILD", "1")
    monkeypatch.setattr(bench, "_probe_backend",
                        lambda deadline=None: pytest.fail("child must not re-probe"))
    bench._recovery_handoff()
    assert not [ln for ln in capsys.readouterr().out.splitlines()
                if ln.startswith("{")]
