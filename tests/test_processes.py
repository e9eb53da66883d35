"""Process unit tests on synthetic images (reference test_processes)."""

import numpy as np
import pytest


def _gaussian(img, x, y, flux, sigma=1.8):
    yy, xx = np.mgrid[0:img.shape[0], 0:img.shape[1]]
    img += flux / (2 * np.pi * sigma**2) * np.exp(
        -0.5 * ((xx - x) ** 2 + (yy - y) ** 2) / sigma**2)


class TestBackgroundEstimation:
    def test_gradient_background_removed(self):
        from lightcurver_tpu.processes.background_estimation import \
            subtract_background

        rng = np.random.default_rng(0)
        yy, xx = np.mgrid[0:200, 0:200]
        background = 5.0 + 0.01 * xx + 0.005 * yy
        image = background + rng.normal(0, 0.3, (200, 200))
        sub, bkg = subtract_background(image, n_boxes=5)
        assert abs(float(np.median(sub))) < 0.05
        assert bkg.globalrms == pytest.approx(0.3, rel=0.3)

    def test_masked_two_pass(self):
        from lightcurver_tpu.processes.background_estimation import \
            subtract_background

        rng = np.random.default_rng(1)
        image = 10.0 + rng.normal(0, 0.5, (120, 120))
        _gaussian(image, 60, 60, 5000.0, sigma=6.0)
        sub, bkg = subtract_background(image, mask_sources_first=True,
                                       n_boxes=3)
        assert bkg.globalback == pytest.approx(10.0, abs=0.3)


class TestStarExtraction:
    def _image(self, native):
        import os

        rng = np.random.default_rng(2)
        image = rng.normal(0, 1, (150, 150)).astype(np.float32)
        positions = [(30.0, 40.0, 2000.0), (100.0, 110.0, 3000.0),
                     (70.0, 20.0, 1500.0)]
        for x, y, f in positions:
            _gaussian(image, x, y, f)
        return image, positions

    @pytest.mark.parametrize("native", [True, False])
    def test_positions_and_order(self, native, monkeypatch):
        import lightcurver_tpu.native as nat

        if not native:
            monkeypatch.setenv("LIGHTCURVER_DISABLE_NATIVE", "1")
            monkeypatch.setattr(nat, "_lib", None)
            monkeypatch.setattr(nat, "_tried", False)
        elif nat.load() is None:
            # without this guard the 'native' variant silently runs the
            # numpy fallback and self-confirms
            pytest.skip("native backend unavailable (no toolchain)")
        from lightcurver_tpu.processes.star_extraction import \
            extract_stars

        image, positions = self._image(native)
        sources = extract_stars(image, np.ones_like(image),
                                detection_threshold=3, min_area=8)
        assert len(sources) == 3
        # brightest first
        assert sources["flux"].is_monotonic_decreasing
        found = {(round(r.x), round(r.y)) for r in sources.itertuples()}
        assert found == {(30, 40), (100, 110), (70, 20)}
        assert (sources["FWHM"] > 2).all()
        assert (sources["ellipticity"] < 0.3).all()



    @pytest.mark.parametrize("case", ["all_nan", "constant", "border_spike",
                                      "huge", "tiny_image"])
    def test_pathological_inputs_native_matches_fallback(self, case,
                                                         monkeypatch):
        """Fuzz the C++ extractor against the numpy fallback.

        Degenerate frames (dead detector, saturated, cosmic at the
        border, absurd scaling) must neither crash nor diverge between
        backends — the pipeline flags such frames downstream instead.
        """
        from lightcurver_tpu.processes.star_extraction import \
            extract_stars

        rng = np.random.default_rng(5)
        if case == "all_nan":
            image = np.full((64, 64), np.nan, np.float32)
        elif case == "constant":
            image = np.full((64, 64), 7.0, np.float32)
        elif case == "border_spike":
            image = rng.normal(0, 1, (64, 64)).astype(np.float32)
            image[0, :4] = 5000.0
        elif case == "huge":
            image = (1e30 * rng.normal(0, 1, (64, 64))).astype(np.float32)
        else:  # tiny_image
            image = rng.normal(0, 1, (4, 4)).astype(np.float32)
        var = np.ones_like(image)

        def run(disable_native):
            if disable_native:
                monkeypatch.setenv("LIGHTCURVER_DISABLE_NATIVE", "1")
            else:
                monkeypatch.delenv("LIGHTCURVER_DISABLE_NATIVE",
                                   raising=False)
            import lightcurver_tpu.native as nat

            monkeypatch.setattr(nat, "_lib", None)
            monkeypatch.setattr(nat, "_tried", False)
            return extract_stars(image.copy(), var.copy(),
                                 detection_threshold=3, min_area=8)

        s_native = run(False)
        import lightcurver_tpu.native as nat

        if nat._lib is None:
            # the 'native' run silently fell back to numpy: the parity
            # comparison would self-confirm
            pytest.skip("native backend unavailable (no toolchain)")
        s_numpy = run(True)
        if case == "huge":
            # 1e30 pixels overflow f32 variance (sigma^2 = 1e60): both
            # backends must survive with finite coordinates, but their
            # overflow artifacts legitimately differ — real frames are
            # ADU-scaled and never get here
            for s in (s_native, s_numpy):
                if len(s):
                    assert np.isfinite(np.asarray(s["x"], float)).all()
            return
        assert len(s_native) == len(s_numpy)
        if len(s_native):
            np.testing.assert_allclose(
                np.sort(np.asarray(s_native["x"], float)),
                np.sort(np.asarray(s_numpy["x"], float)), atol=0.5)



class TestBackgroundMeshParity:
    def test_native_matches_fallback(self, monkeypatch):
        """The C++ mesh estimator equals the Python fallback (f32 eps)."""
        import lightcurver_tpu.native as nat
        import lightcurver_tpu.processes.background_estimation as bg

        rng = np.random.default_rng(0)
        img = (10 + rng.normal(0, 0.5, (200, 180))).astype(np.float32)
        _gaussian(img, 45, 55, 5000.0)
        img[0:3, 0:3] = np.nan
        mask = np.zeros_like(img, dtype=bool)
        mask[100:120, :] = True

        def fresh(disable):
            if disable:
                monkeypatch.setenv("LIGHTCURVER_DISABLE_NATIVE", "1")
            else:
                monkeypatch.delenv("LIGHTCURVER_DISABLE_NATIVE",
                                   raising=False)
            monkeypatch.setattr(nat, "_lib", None)
            monkeypatch.setattr(nat, "_tried", False)
            return bg.Background(img, box_size=32, mask=mask)

        b_native = fresh(False)
        if nat._lib is None:
            pytest.skip("native backend unavailable (no toolchain)")
        b_python = fresh(True)
        np.testing.assert_allclose(b_native.back(), b_python.back(),
                                   atol=1e-5)
        np.testing.assert_allclose(b_native.rms(), b_python.rms(),
                                   atol=1e-5)


class TestCosmics:
    def test_cosmic_masked_star_kept(self):
        from lightcurver_tpu.processes.cosmics import detect_cosmics

        rng = np.random.default_rng(3)
        image = rng.normal(0, 1, (64, 64)).astype(float)
        _gaussian(image, 20, 20, 3000.0)   # star: sharp but structured
        image[45, 45] = 300.0              # single-pixel cosmic
        image[46, 45] = 200.0
        mask, cleaned = detect_cosmics(image, invar=np.ones_like(image),
                                       sigclip=5.0, objlim=4.0)
        assert mask[45, 45] and mask[46, 45]
        assert not mask[20, 20]            # star core protected
        assert abs(cleaned[45, 45]) < 10

    def test_native_matches_fallback_fuzz(self):
        """The C++ L.A.Cosmic kernel is a bit-exact twin of the scipy
        fallback: medians are element selections, and the supersampled
        Laplacian replicates ndimage.convolve's accumulation order
        term by term (weights applied before summing, in top, left,
        centre, right, bottom order — verified bitwise against
        ndimage on random doubles), so every intermediate (and hence
        the mask AND the cleaned image) agrees exactly."""
        import lightcurver_tpu.native as nat
        from lightcurver_tpu.processes.cosmics import detect_cosmics_numpy

        if nat.load() is None:
            pytest.skip("native backend unavailable (no toolchain)")

        rng = np.random.default_rng(11)
        for _ in range(6):
            n = int(rng.integers(8, 90))
            image = rng.normal(100.0, 5.0, (n, n))
            for _ in range(3):
                cy, cx = rng.uniform(2, n - 2, 2)
                _gaussian(image, cy, cx, float(rng.uniform(300, 3000)))
            for _ in range(int(rng.integers(0, 6))):
                y, x = rng.integers(1, n - 1, 2)
                image[y, x] += rng.uniform(300, 6000)
            var = np.abs(image) + 25.0
            m_py, c_py = detect_cosmics_numpy(image, invar=var)
            m_cc, c_cc = nat.detect_cosmics(image, invar=var)
            np.testing.assert_array_equal(m_py, m_cc)
            np.testing.assert_array_equal(c_py, c_cc)
        # no-variance branch (invar=None -> |data| + 1)
        m_py, c_py = detect_cosmics_numpy(image)
        m_cc, c_cc = nat.detect_cosmics(image)
        np.testing.assert_array_equal(m_py, m_cc)
        np.testing.assert_array_equal(c_py, c_cc)

    def test_dispatcher_uses_native_when_available(self, monkeypatch):
        """detect_cosmics routes through the native kernel (and falls
        back cleanly when it reports unavailable)."""
        import lightcurver_tpu.native as nat
        from lightcurver_tpu.processes import cosmics

        calls = []
        real = nat.detect_cosmics

        def spy(data, **kw):
            calls.append("native")
            return real(data, **kw)

        monkeypatch.setattr(nat, "detect_cosmics", spy)
        img = np.random.default_rng(0).normal(0, 1, (16, 16))
        cosmics.detect_cosmics(img, invar=np.ones_like(img))
        assert calls == ["native"]

        monkeypatch.setattr(nat, "detect_cosmics",
                            lambda *a, **k: None)
        mask, cleaned = cosmics.detect_cosmics(
            img, invar=np.ones_like(img))
        assert mask.shape == img.shape and cleaned.shape == img.shape

    def test_selftest_stamp_amortizes_and_invalidates(self):
        """The SIGILL-guard subprocess selftest runs once per build:
        a valid stamp (so-hash + host CPU identity) skips it, and any
        change to the cached binary invalidates the stamp."""
        import lightcurver_tpu.native as nat

        if nat.load() is None:
            pytest.skip("native backend unavailable (no toolchain)")
        lib_path = nat._lib_path()
        # load() stamps after compiling or after one passing selftest
        assert nat._stamp_path(lib_path).exists()
        assert nat._stamp_valid(lib_path)
        # the stamp is bound to the exact binary bytes
        stamp = nat._stamp_path(lib_path)
        original = stamp.read_text()
        try:
            stamp.write_text(original.replace(original[0],
                                              "0" if original[0] != "0"
                                              else "1", 1))
            assert not nat._stamp_valid(lib_path)
        finally:
            stamp.write_text(original)
        assert nat._stamp_valid(lib_path)


class TestCutout:
    def test_extract_stamp_centering_and_noise(self):
        from lightcurver_tpu.processes.cutout_making import extract_stamp
        from lightcurver_tpu.io.fits import Header
        from lightcurver_tpu.io.wcs import TanWCS

        scale = 0.2 / 3600
        wcs = TanWCS(10.0, 20.0, 51.0, 51.0,
                     [[-scale, 0.0], [0.0, scale]])
        header = Header()
        header.update(wcs.to_header_cards())
        data = np.zeros((100, 100), np.float32)
        data[50, 50] = 7.0  # e-/s at the reference pixel
        cut, noise, wcs_str, center = extract_stamp(
            data, header, exptime=30.0, sky_coord=(10.0, 20.0),
            cutout_size=11,
            background_rms_electron_per_second=0.5)
        assert cut.shape == (11, 11)
        assert cut[5, 5] == pytest.approx(7.0)
        # noisemap: sqrt((exptime*rms)^2 + |e|)/exptime
        expected = np.sqrt((30 * 0.5) ** 2 + 7.0 * 30) / 30
        assert noise[5, 5] == pytest.approx(expected, rel=1e-5)
        assert center == pytest.approx([50.0, 50.0])

    def test_partial_stamp_nan_padded(self):
        from lightcurver_tpu.processes.cutout_making import extract_stamp
        from lightcurver_tpu.io.fits import Header
        from lightcurver_tpu.io.wcs import TanWCS

        scale = 0.2 / 3600
        wcs = TanWCS(10.0, 20.0, 3.0, 3.0, [[-scale, 0], [0, scale]])
        header = Header()
        header.update(wcs.to_header_cards())
        data = np.ones((100, 100), np.float32)
        cut, noise, _, _ = extract_stamp(
            data, header, 30.0, (10.0, 20.0), 11, 0.5)
        assert np.isnan(cut).any()
        assert np.isfinite(cut[5, 5])


def test_seeing_estimator_peak():
    from lightcurver_tpu.processes.frame_characterization import \
        estimate_seeing

    rng = np.random.default_rng(4)
    # 40 stars near FWHM 3.2 + junk detections spread wide
    fwhms = np.concatenate([rng.normal(3.2, 0.15, 40),
                            rng.uniform(5, 25, 15)])
    seeing = estimate_seeing({"FWHM": fwhms})
    assert seeing == pytest.approx(3.2, abs=0.3)


class TestPipelinedBuckets:
    """Control-flow contract of the PSF task's software pipeline."""

    def _run(self, buckets, fail_prepare_at=None, fail_dispatch_at=None):
        from lightcurver_tpu.processes.psf_modelling import (
            run_pipelined_buckets)

        events = []

        def prepare(bucket):
            if bucket == fail_prepare_at:
                raise OSError(f"corrupt HDF5 in {bucket}")
            events.append(("prepare", bucket))
            return bucket

        def dispatch(chunk):
            if chunk == fail_dispatch_at:
                raise RuntimeError(f"dispatch failed for {chunk}")
            events.append(("dispatch", chunk))
            return f"out-{chunk}"

        def store(chunk, out, t0):
            assert out == f"out-{chunk}"
            events.append(("store", chunk))

        run_pipelined_buckets(buckets, prepare, dispatch, store)
        return events

    def test_all_buckets_stored_in_order(self):
        events = self._run(["a", "b", "c"])
        assert [e for e in events if e[0] == "store"] == \
            [("store", "a"), ("store", "b"), ("store", "c")]
        # pipelining: bucket b is dispatched BEFORE bucket a is stored
        assert events.index(("dispatch", "b")) < \
            events.index(("store", "a"))

    def test_empty_chunks_skipped(self):
        from lightcurver_tpu.processes.psf_modelling import (
            run_pipelined_buckets)

        stored = []
        run_pipelined_buckets(
            ["a", "", "c"], prepare=lambda b: b,
            dispatch=lambda c: c, store=lambda c, o, t: stored.append(c))
        assert stored == ["a", "c"]
        run_pipelined_buckets([], lambda b: b, lambda c: c,
                              lambda c, o, t: stored.append(c))
        assert stored == ["a", "c"]

    def test_finished_bucket_survives_next_prepare_failure(self):
        """A corrupt bucket b must not discard bucket a's finished
        fits: they are stored before the exception propagates."""
        from lightcurver_tpu.processes.psf_modelling import (
            run_pipelined_buckets)

        def prepare(bucket):
            if bucket == "b":
                raise OSError("corrupt HDF5")
            return bucket

        stored = []
        with pytest.raises(OSError, match="corrupt"):
            run_pipelined_buckets(
                ["a", "b", "c"], prepare, dispatch=lambda c: f"out-{c}",
                store=lambda c, o, t: stored.append(c))
        assert stored == ["a"]

    def test_finished_bucket_survives_next_dispatch_failure(self):
        stored = []
        from lightcurver_tpu.processes.psf_modelling import (
            run_pipelined_buckets)

        with pytest.raises(RuntimeError, match="boom"):
            run_pipelined_buckets(
                ["a", "b"], prepare=lambda b: b,
                dispatch=lambda c: (_ for _ in ()).throw(
                    RuntimeError("boom")) if c == "b" else f"out-{c}",
                store=lambda c, o, t: stored.append(c))
        assert stored == ["a"]


@pytest.fixture()
def _mini_workdir(tmp_path, monkeypatch):
    """Config + initialized DB (mirrors test_structure's fixture)."""
    import yaml

    config = {
        "workdir": str(tmp_path),
        "raw_dirs": [str(tmp_path / "raw")],
        "ROI": {"testroi": {"coordinates": [42.2031, 19.22528]}},
        "photometric_band": "r_sdss",
        "stars_to_use_psf": "abc",
        "stars_to_use_norm": None,
        "stars_to_exclude_psf": None,
        "stars_to_exclude_norm": None,
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.dump(config))
    monkeypatch.setenv("LIGHTCURVER_CONFIG", str(cfg_path))
    from lightcurver_tpu.structure.database import initialize_database

    initialize_database()
    return tmp_path


class TestPsfChi2Gate:
    def test_stale_psf_row_cannot_admit_frame(self, _mini_workdir):
        """The chi2 gate must judge the PSF the fit will USE (the
        config-derived psf_ref), not an arbitrary row: a stale passing
        PSF from an old star set must not admit a frame whose current
        PSF failed the gate."""
        from lightcurver_tpu.processes.star_photometry import \
            get_frames_for_star
        from lightcurver_tpu.structure.database import execute_sqlite_query

        fp = 999
        execute_sqlite_query("INSERT INTO frames (id, mjd) VALUES "
                             "(1, 60000.0)", is_select=False)
        for name, gid in [("a", "g1"), ("b", "g2")]:
            execute_sqlite_query(
                "INSERT INTO stars (combined_footprint_hash, name, ra, "
                "dec, gaia_id, distance_to_roi_arcsec) VALUES "
                "(?, ?, 42.0, 19.0, ?, 10.0)", params=(fp, name, gid),
                is_select=False)
            execute_sqlite_query(
                "INSERT INTO stars_in_frames (frame_id, star_gaia_id, "
                "combined_footprint_hash) VALUES (1, ?, ?)",
                params=(gid, fp), is_select=False)
        # current config (stars a, b in frame) derives psf_ref 'psf_ab';
        # a stale 'psf_a' row passes the gate, the current one fails
        q = ("INSERT INTO PSFs (combined_footprint_hash, frame_id, chi2, "
             "psf_ref, subsampling_factor) VALUES (?, 1, ?, ?, 2)")
        execute_sqlite_query(q, params=(fp, 1.0, "psf_a"), is_select=False)
        execute_sqlite_query(q, params=(fp, 8.0, "psf_ab"),
                             is_select=False)
        frames = get_frames_for_star(fp, "g1", 0.0, 2.0)
        assert len(frames) == 0

        # once the CURRENT psf passes, the frame is admitted exactly once
        execute_sqlite_query(
            "UPDATE PSFs SET chi2 = 1.2 WHERE psf_ref = 'psf_ab'",
            is_select=False)
        frames = get_frames_for_star(fp, "g1", 0.0, 2.0)
        assert list(frames["id"]) == [1]
        assert list(frames["psf_ref"]) == ["psf_ab"]


class TestGetFluxesNullHandling:
    def test_null_fluxes_come_back_as_float_nan(self, _mini_workdir):
        """NaN fluxes bind as NULL in sqlite; get_fluxes must return a
        float column (NULL -> NaN) that pandas can aggregate — the
        reference's IFNULL(...,'NaN') yields object dtype and crashes
        groupby().median() on modern pandas."""
        from lightcurver_tpu.processes.normalization_calculation import \
            get_fluxes
        from lightcurver_tpu.structure.database import execute_sqlite_query

        fp = 999
        for fid in (1, 2):
            execute_sqlite_query(
                "INSERT INTO frames (id, mjd) VALUES (?, 60000.0)",
                params=(fid,), is_select=False)
        execute_sqlite_query(
            "INSERT INTO stars (combined_footprint_hash, name, ra, dec, "
            "gaia_id, distance_to_roi_arcsec) VALUES "
            "(?, 'a', 42.0, 19.0, 'g1', 10.0)", params=(fp,),
            is_select=False)
        for fid in (1, 2):
            execute_sqlite_query(
                "INSERT INTO stars_in_frames (frame_id, star_gaia_id, "
                "combined_footprint_hash) VALUES (?, 'g1', ?)",
                params=(fid, fp), is_select=False)
        q = ("INSERT INTO star_flux_in_frame (frame_id, star_gaia_id, "
             "combined_footprint_hash, flux, flux_uncertainty, chi2) "
             "VALUES (?, 'g1', ?, ?, ?, 1.0)")
        execute_sqlite_query(q, params=(1, fp, 100.0, 1.0),
                             is_select=False)
        execute_sqlite_query(q, params=(2, fp, float("nan"),
                                        float("nan")), is_select=False)
        df = get_fluxes(fp, 0.0, 2.0)
        assert len(df) == 2
        assert df["flux"].dtype.kind == "f"
        assert df["d_flux"].dtype.kind == "f"
        assert np.isnan(df["flux"]).sum() == 1
        # the aggregation that crashed on object dtype works
        med = df.groupby("star_gaia_id")["flux"].median()
        assert med["g1"] == pytest.approx(100.0)


def test_extract_stars_empty_detection_keeps_columns():
    """Reference contract (tests/test_processes/test_star_extraction.py):
    pure noise below threshold detects ZERO sources, and the empty
    table still carries the downstream-consumed columns."""
    from lightcurver_tpu.processes.star_extraction import extract_stars

    rng = np.random.default_rng(0)
    image = rng.random((100, 100)).astype(np.float32)
    sources = extract_stars(image, np.ones_like(image),
                            detection_threshold=3, min_area=10)
    assert len(sources) == 0
    for col in ("xcentroid", "ycentroid", "a", "b", "flux", "npix",
                "FWHM", "ellipticity"):
        assert col in sources.columns
