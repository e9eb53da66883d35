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
