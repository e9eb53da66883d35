"""CLI entry points: lc_init scaffold and lc_run argument contract."""

import sys

import yaml


def test_lc_init_scaffold(tmp_path, monkeypatch):
    from lightcurver_tpu.scripts.initialize import initialize

    monkeypatch.setattr(sys, "argv", [
        "lc_init", "--workdir", str(tmp_path), "--roi_name", "J0248",
        "--roi_ra", "42.2031", "--roi_dec", "19.22528",
        "--photom_band", "r_sdss"])
    initialize()

    config = yaml.safe_load((tmp_path / "config.yaml").read_text())
    assert config["ROI"] == {"J0248": {"coordinates": [42.2031, 19.22528]}}
    assert config["photometric_band"] == "r_sdss"
    assert config["workdir"] == str(tmp_path)
    # the scaffolded config carries the FULL template key namespace (the
    # workflow manager hard-errors on missing keys)
    from pathlib import Path

    import lightcurver_tpu

    template = yaml.safe_load(
        (Path(lightcurver_tpu.__file__).parent / "pipeline"
         / "example_config_file" / "config.yaml").read_text())
    assert set(config) == set(template)
    # header parser stub in place, loudly unimplemented
    stub = (tmp_path / "header_parser" / "parse_header.py").read_text()
    assert "def parse_header(header):" in stub
    assert "RuntimeError" in stub
    # the template's inline documentation survives the scaffold (the
    # reference preserves comments via a ruamel round-trip; a plain
    # safe_load->dump would strip every one of them)
    text = (tmp_path / "config.yaml").read_text()
    template_text = (Path(lightcurver_tpu.__file__).parent / "pipeline"
                     / "example_config_file" / "config.yaml").read_text()
    template_comments = [ln for ln in template_text.splitlines()
                         if ln.lstrip().startswith("#")]
    assert len(template_comments) > 10  # template is richly commented
    for comment in template_comments:
        assert comment in text
    assert "# [ra, dec] degrees" in text  # kept on the rewritten ROI line


def test_lc_run_sets_env_and_forwards_steps(tmp_path, monkeypatch):
    import lightcurver_tpu.pipeline.workflow_manager as wm_mod
    from lightcurver_tpu.scripts.run import run

    calls = {}

    class FakeWM:
        def run(self, start_step=None, stop_step=None):
            calls["start"] = start_step
            calls["stop"] = stop_step

    monkeypatch.setattr(wm_mod, "WorkflowManager", FakeWM)
    config = tmp_path / "config.yaml"
    config.write_text("{}")
    monkeypatch.setattr(sys, "argv", [
        "lc_run", str(config), "--start", "psf_modeling",
        "--stop", "star_photometry"])
    run()
    import os

    assert os.environ["LIGHTCURVER_CONFIG"] == str(config)
    assert calls == {"start": "psf_modeling", "stop": "star_photometry"}


def test_pool_run_contains_per_job_failures(tmp_path, monkeypatch, caplog):
    """One corrupt job must not abort the batch (serial and pooled)."""
    import logging

    import lightcurver_tpu.pipeline.task_wrappers as tw

    done = []

    def worker(job):
        if job[0] == "bad":
            raise IOError("truncated FITS")
        done.append(job[0])

    monkeypatch.setattr(tw, "get_user_config",
                        lambda: {"multiprocessing_cpu_count": 1})
    with caplog.at_level(logging.WARNING, logger="lightcurver"):
        tw._pool_run(worker, [("a", 1), ("bad", 2), ("b", 3)])
    assert done == ["a", "b"]
    assert any("1/3 jobs failed" in r.message for r in caplog.records)


def test_pool_run_escalates_when_all_jobs_fail(monkeypatch):
    """100% job failure is a systematic error, not bad frames."""
    import pytest as _pytest

    import lightcurver_tpu.pipeline.task_wrappers as tw
    from lightcurver_tpu.structure.exceptions import TaskWasNotSuccessful

    def worker(job):
        raise IOError("binary missing")

    monkeypatch.setattr(tw, "get_user_config",
                        lambda: {"multiprocessing_cpu_count": 1})
    with _pytest.raises(TaskWasNotSuccessful):
        tw._pool_run(worker, [("a", 1), ("b", 2)])


def test_import_anti_join_and_dedup_key_on_stem(tmp_path, monkeypatch,
                                                caplog):
    """The calibrated frame path is frames/<stem>.fits, so both the
    DB anti-join and the duplicate guard must key on the file STEM:
    'a.fit' next to 'a.fits' would silently overwrite the same
    calibrated file (pixels from one raw, DB metadata from the other)."""
    import logging

    import pandas as pd

    import lightcurver_tpu.pipeline.task_wrappers as tw

    raw = tmp_path / "raw"
    raw.mkdir()
    for name in ("a.fit", "a.fits", "b.fits", "c.fits"):
        (raw / name).write_bytes(b"")

    monkeypatch.setattr(tw, "get_user_config", lambda: {
        "raw_dirs": [raw], "files_match_pattern": "*",
        "multiprocessing_cpu_count": 1})
    # 'c' already imported under a different extension: anti-join on the
    # stem must skip c.fits too
    monkeypatch.setattr(tw, "get_pandas", lambda **kw: pd.DataFrame(
        {"original_image_path": ["/old/place/c.fit"], "id": [1]}))
    ran = []
    monkeypatch.setattr(tw, "_pool_run",
                        lambda worker, jobs: ran.extend(jobs))
    with caplog.at_level(logging.ERROR, logger="lightcurver.importation"):
        tw.read_convert_skysub_character_catalog()
    imported_names = sorted(j[0].name for j in ran)
    assert imported_names == ["a.fit", "b.fits"]  # first 'a' wins, c skipped
    assert any("Duplicate raw file stem 'a'" in r.message
               for r in caplog.records)


def test_lc_init_yaml_special_names(tmp_path, monkeypatch):
    """ROI names YAML would mis-parse unquoted ('NO' -> bool, '2023' ->
    int, '#'-containing -> comment) must round-trip verbatim."""
    from lightcurver_tpu.scripts.initialize import initialize

    monkeypatch.setattr(sys, "argv", [
        "lc_init", "--workdir", str(tmp_path), "--roi_name", "NO",
        "--roi_ra", "10.0", "--roi_dec", "20.0",
        "--photom_band", "r_sdss"])
    initialize()
    config = yaml.safe_load((tmp_path / "config.yaml").read_text())
    assert config["ROI"] == {"NO": {"coordinates": [10.0, 20.0]}}


def test_relax_config_check_is_value_aware(tmp_path, monkeypatch):
    """LIGHTCURVER_RELAX_CONFIG_CHECK=0 must stay STRICT (presence
    alone relaxed the check, contradicting the 'set ...=1' message)."""
    from pathlib import Path

    import pytest

    import lightcurver_tpu
    from lightcurver_tpu.pipeline.workflow_manager import \
        _validate_config_keys

    template = (Path(lightcurver_tpu.__file__).parent / "pipeline"
                / "example_config_file" / "config.yaml")
    config = yaml.safe_load(template.read_text())
    config["workdir"] = str(tmp_path)
    config["definitely_a_typoed_key"] = 1
    bad = tmp_path / "bad.yaml"
    bad.write_text(yaml.dump(config))
    monkeypatch.setenv("LIGHTCURVER_CONFIG", str(bad))

    monkeypatch.setenv("LIGHTCURVER_RELAX_CONFIG_CHECK", "0")
    with pytest.raises(RuntimeError, match="not in the latest config"):
        _validate_config_keys()
    monkeypatch.setenv("LIGHTCURVER_RELAX_CONFIG_CHECK", "1")
    _validate_config_keys()  # relaxed: no raise


def test_queue_listener_relays_to_live_handlers():
    """Worker records must reach handlers attached AFTER the listener
    was built (a snapshot of 'lightcurver'.handlers is empty when
    setup_base_logger never ran, silently dropping worker logs)."""
    import logging
    import logging.handlers
    import queue

    from lightcurver_tpu.pipeline.task_wrappers import _RelayHandler

    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    log_queue = queue.Queue()
    listener = logging.handlers.QueueListener(log_queue, _RelayHandler())
    listener.start()
    lg = logging.getLogger("lightcurver.test_relay")
    lg.addHandler(Capture())
    lg.setLevel(logging.INFO)
    try:
        # what worker_init's QueueHandler would enqueue
        logging.handlers.QueueHandler(log_queue).emit(
            lg.makeRecord("lightcurver.test_relay", logging.INFO,
                          __file__, 1, "worker traceback", (), None))
        listener.stop()  # drains the queue
    finally:
        lg.handlers = []
    assert records == ["worker traceback"]


def test_flow_diagram_generator(tmp_path):
    """The docs diagram tool renders every DAG task and parses as XML.

    The committed docs/img/workflow_diagram.svg is generated by this
    tool from the live pipeline_dependency_graph.yaml (the reference
    ships a hand-drawn equivalent, reference docs/flow_diagram/).
    """
    import pathlib
    import sys
    import xml.dom.minidom

    sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
    try:
        import make_flow_diagram
    finally:
        sys.path.pop(0)

    out = tmp_path / "diagram.svg"
    make_flow_diagram.main(out)
    svg = out.read_text()
    xml.dom.minidom.parseString(svg)

    spec = yaml.safe_load(
        (pathlib.Path(make_flow_diagram.__file__).parents[1] /
         "lightcurver_tpu" / "pipeline" /
         "pipeline_dependency_graph.yaml").read_text())
    for task in spec["tasks"]:
        assert f'>{task["name"]}</text>' in svg
        assert task["nature"] in make_flow_diagram.NATURE_STYLE
    # one edge per dependency (plus the arrowhead marker path)
    n_deps = sum(len(t["dependencies"]) for t in spec["tasks"])
    assert svg.count('marker-end="url(#arr)"') == n_deps
