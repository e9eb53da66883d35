"""astrometry.net wrapper, exercised with a FAKE solve-field binary.

The real binary is not installable here; a stand-in on PATH validates
the full wrapper contract: the generated .xyls source table, the CLI
arguments, the WCS readback, and the frame-header rewrite — plus the
failure path.
"""

import os
import stat
import textwrap

import numpy as np
import pandas as pd
import pytest

RA, DEC = 42.2031, 19.22528

# the fake binary writes a NAXIS=0 FITS with this TAN WCS into --dir
_FAKE_SOLVE_FIELD = textwrap.dedent("""\
    #!/usr/bin/env python3
    import os, sys

    if os.environ.get("FAKESOLVE_FAIL"):
        sys.stderr.write("simulated failure")
        sys.exit(1)

    args = sys.argv[1:]
    out_dir = args[args.index("--dir") + 1]
    # the input .xyls must exist and be non-trivial
    assert os.path.getsize(args[0]) >= 2880 * 3, "xyls too small"
    assert "--scale-low" in args and "--ra" in args

    cards = [
        ("SIMPLE", "T"), ("BITPIX", "8"), ("NAXIS", "0"),
        ("CTYPE1", "'RA---TAN'"), ("CTYPE2", "'DEC--TAN'"),
        ("CRVAL1", "42.2031"), ("CRVAL2", "19.22528"),
        ("CRPIX1", "20.5"), ("CRPIX2", "20.5"),
        ("CD1_1", "-5.5555E-05"), ("CD1_2", "0.0"),
        ("CD2_1", "0.0"), ("CD2_2", "5.5555E-05"),
    ]
    text = "".join(f"{k:<8}= {v:>20}".ljust(80) for k, v in cards)
    text += "END".ljust(80)
    text += " " * (-len(text) % 2880)
    with open(os.path.join(out_dir, "sources.wcs"), "w") as f:
        f.write(text)
""")


@pytest.fixture()
def fake_solver(tmp_path, monkeypatch):
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    exe = bin_dir / "solve-field"
    exe.write_text(_FAKE_SOLVE_FIELD)
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH",
                       f"{bin_dir}{os.pathsep}" + os.environ["PATH"])
    monkeypatch.delenv("FAKESOLVE_FAIL", raising=False)
    return exe


@pytest.fixture()
def frame_and_sources(tmp_path):
    from lightcurver_tpu.io.fits import write_fits, Header
    from lightcurver_tpu.processes.star_extraction import write_sources

    rng = np.random.default_rng(0)
    image_path = tmp_path / "frame.fits"
    header = Header()
    header["EXPTIME"] = 30.0
    write_fits(image_path, rng.normal(0, 1, (40, 40)).astype(np.float32),
               header)
    sources_path = tmp_path / "sources.csv"
    write_sources(pd.DataFrame({
        "x": rng.uniform(0, 40, 25), "y": rng.uniform(0, 40, 25),
        "flux": rng.uniform(10, 100, 25)}), sources_path)
    return image_path, sources_path


_CONFIG = {"plate_scale_interval": [0.1, 0.3],
           "ROI_ra_deg": RA, "ROI_dec_deg": DEC}


def test_solve_one_image_with_fake_binary(fake_solver, frame_and_sources):
    from lightcurver_tpu.io.fits import read_fits
    from lightcurver_tpu.processes.plate_solving import solve_one_image

    image_path, sources_path = frame_and_sources
    wcs = solve_one_image(image_path, sources_path, _CONFIG)
    assert wcs.crval1 == pytest.approx(RA)
    assert wcs.crval2 == pytest.approx(DEC)
    # the solved WCS was written into the frame header
    _, header = read_fits(image_path)
    assert header["CTYPE1"] == "RA---TAN"
    assert float(header["CRVAL1"]) == pytest.approx(RA)
    assert float(header["CRPIX1"]) == pytest.approx(20.5)
    # pre-existing cards survive
    assert float(header["EXPTIME"]) == pytest.approx(30.0)


def test_solve_failure_raises(fake_solver, frame_and_sources,
                              monkeypatch):
    from lightcurver_tpu.processes.plate_solving import (
        CouldNotSolveError, solve_one_image)

    monkeypatch.setenv("FAKESOLVE_FAIL", "1")
    image_path, sources_path = frame_and_sources
    with pytest.raises(CouldNotSolveError, match="solve-field failed"):
        solve_one_image(image_path, sources_path, _CONFIG)


def test_missing_binary_raises(frame_and_sources, monkeypatch):
    from lightcurver_tpu.processes import plate_solving

    monkeypatch.setattr(plate_solving, "solve_field_available",
                        lambda: False)
    image_path, sources_path = frame_and_sources
    with pytest.raises(plate_solving.CouldNotSolveError,
                       match="not installed"):
        plate_solving.solve_one_image(image_path, sources_path, _CONFIG)


def test_xyls_is_valid_bintable(tmp_path):
    """The generated .xyls parses as the FITS BINTABLE solve-field wants."""
    from lightcurver_tpu.processes.plate_solving import _write_xyls

    sources = pd.DataFrame({"x": [1.0, 2.0], "y": [3.0, 4.0],
                            "flux": [10.0, 5.0]})
    path = tmp_path / "s.xyls"
    _write_xyls(path, sources, 40, 40)
    raw = path.read_bytes()
    assert len(raw) % 2880 == 0
    assert raw[:6] == b"SIMPLE"
    ext = raw[2880:2880 * 2].decode("latin-1")
    assert ext.startswith("XTENSION") and "'BINTABLE'" in ext[:80]
    # 2 rows x 3 float64 columns, 1-based pixel convention
    import struct

    data_start = raw.index(b"END", 2880)
    data_start = (data_start // 2880 + 1) * 2880
    row0 = struct.unpack(">ddd", raw[data_start:data_start + 24])
    assert row0 == (2.0, 4.0, 10.0)


def test_nova_api_solver_against_fake_server(tmp_path):
    """Full client flow (login -> xyls upload -> poll -> wcs fetch)
    against an in-process fake of the nova.astrometry.net API."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    import pandas as pd

    from lightcurver_tpu.io.fits import write_fits, Header
    from lightcurver_tpu.io.wcs import TanWCS
    from lightcurver_tpu.processes.plate_solving import solve_via_nova_api

    true_wcs = TanWCS(150.1, 2.2, 33.0, 31.0,
                      [[-5.5e-5, 0.0], [0.0, 5.5e-5]])
    wcs_path = tmp_path / "solution.wcs"
    hdr = Header()
    hdr.update(true_wcs.to_header_cards())
    write_fits(wcs_path, np.zeros((1, 1), np.float32), hdr)
    wcs_bytes = wcs_path.read_bytes()

    seen = {"login": 0, "upload": 0}

    class FakeNova(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, obj):
            body = json.dumps(obj).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            if self.path.endswith("/api/login"):
                seen["login"] += 1
                assert b"fake-key" in body
                self._json({"status": "success", "session": "s1"})
            elif self.path.endswith("/api/upload"):
                seen["upload"] += 1
                assert b"sources.xyls" in body      # multipart filename
                assert b"scale_lower" in body       # hints forwarded
                self._json({"status": "success", "subid": 77})
            else:
                self.send_response(404)
                self.end_headers()

        def do_GET(self):
            if self.path.endswith("/api/submissions/77"):
                self._json({"jobs": [123]})
            elif self.path.endswith("/api/jobs/123"):
                self._json({"status": "success"})
            elif self.path.endswith("/wcs_file/123"):
                self.send_response(200)
                self.end_headers()
                self.wfile.write(wcs_bytes)
            else:
                self.send_response(404)
                self.end_headers()

    server = HTTPServer(("127.0.0.1", 0), FakeNova)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        sources = pd.DataFrame({"x": [10.0, 20.0], "y": [12.0, 25.0],
                                "flux": [500.0, 300.0]})
        config = {"astrometry_net_api_key": "fake-key",
                  "plate_scale_interval": [0.15, 0.25],
                  "ROI_ra_deg": 150.1, "ROI_dec_deg": 2.2}
        wcs = solve_via_nova_api(
            sources, 160, 160, config,
            api_url=f"http://127.0.0.1:{port}/api/",
            poll_interval=0.01, timeout=10.0)
    finally:
        server.shutdown()
    assert seen == {"login": 1, "upload": 1}
    assert wcs.crval1 == pytest.approx(150.1)
    ra, dec = wcs.pixel_to_world(32.0, 30.0)
    ra0, dec0 = true_wcs.pixel_to_world(32.0, 30.0)
    assert ra == pytest.approx(ra0, abs=1e-9)
    assert dec == pytest.approx(dec0, abs=1e-9)
