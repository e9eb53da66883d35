"""FITS reader/writer and TAN WCS round trips."""

import numpy as np
import pytest


class TestFits:
    def test_write_read_roundtrip(self, tmp_path):
        from lightcurver_tpu.io.fits import read_fits, write_fits, Header

        data = np.random.default_rng(0).normal(
            0, 1, (32, 48)).astype(np.float32)
        header = Header()
        header["MJD-OBS"] = (60123.456789, "observation date")
        header["GAIN"] = 1.25
        header["OBJECT"] = "J0248"
        header["SOLVED"] = True
        path = tmp_path / "test.fits"
        write_fits(path, data, header)
        out, h = read_fits(path)
        np.testing.assert_array_equal(out, data)
        assert h["MJD-OBS"] == pytest.approx(60123.456789)
        assert h["GAIN"] == pytest.approx(1.25)
        assert h["OBJECT"] == "J0248"
        assert h["SOLVED"] is True

    def test_memmap_read(self, tmp_path):
        """memmap=True returns a lazy view equal to the eager read, and
        falls back to eager for scaled integer data."""
        from lightcurver_tpu.io.fits import read_fits, write_fits, Header

        data = np.random.default_rng(3).normal(
            0, 1, (64, 32)).astype(np.float32)
        path = tmp_path / "mm.fits"
        write_fits(path, data, Header())
        mm, h = read_fits(path, memmap=True)
        assert isinstance(mm, np.memmap)
        np.testing.assert_array_equal(np.asarray(mm, dtype=np.float32),
                                      data)
        # a trim-style slice reads correctly through the map
        np.testing.assert_array_equal(
            np.asarray(mm[10:20, 5:15], dtype=np.float32),
            data[10:20, 5:15])

    def test_long_string_continue_roundtrip(self, tmp_path):
        """Strings too long for one card go out as CONTINUE cards (the
        FITS long-string convention) and read back intact — including
        embedded quotes and the trailing comment."""
        from lightcurver_tpu.io.fits import read_fits, write_fits, Header

        long_plain = "x" * 100
        long_quotes = ("path='/data/a b'/" * 12)[:180]
        header = Header()
        header["LONGVAL"] = (long_plain, "spills to one CONTINUE")
        header["LONGQ"] = long_quotes
        header["AFTER"] = 7  # cards after the CONTINUE run still parse
        write_fits(tmp_path / "long.fits",
                   np.zeros((4, 4), np.float32), header)
        _, h = read_fits(tmp_path / "long.fits")
        assert h["LONGVAL"] == long_plain
        assert h["LONGQ"] == long_quotes
        assert h["AFTER"] == 7
        assert "CONTINUE" not in h.keys()
        # at the single-card boundary (68 chars) no CONTINUE is emitted
        header2 = Header()
        header2["OKVAL"] = "y" * 68
        write_fits(tmp_path / "ok.fits", np.zeros((4, 4), np.float32),
                   header2)
        raw = (tmp_path / "ok.fits").read_bytes()[:2880]
        assert b"CONTINUE" not in raw
        _, h2 = read_fits(tmp_path / "ok.fits")
        assert h2["OKVAL"] == "y" * 68

    def test_end_keyword_is_exact_match(self, tmp_path):
        """Keywords that merely start with END (ENDTIME) must not be
        mistaken for the END card — that would truncate the header and
        misplace the data offset."""
        from lightcurver_tpu.io.fits import read_fits

        cards = [
            "SIMPLE  =                    T",
            "BITPIX  =                  -32",
            "NAXIS   =                    2",
            "NAXIS1  =                    2",
            "NAXIS2  =                    2",
            "ENDTIME = '2026-08-17T00:00:00'",
            "GAIN    =                  1.5",
            "END",
        ]
        head = "".join(c.ljust(80) for c in cards).encode()
        head += b" " * (-len(head) % 2880)
        data = np.arange(4, dtype=">f4").reshape(2, 2)
        body = data.tobytes()
        body += b"\x00" * (-len(body) % 2880)
        path = tmp_path / "endtime.fits"
        path.write_bytes(head + body)
        out, h = read_fits(path)
        assert h["ENDTIME"] == "2026-08-17T00:00:00"
        assert h["GAIN"] == pytest.approx(1.5)
        np.testing.assert_array_equal(out, data.astype(np.float32))

    def test_int16_bscale(self, tmp_path):
        """Synthesize a BITPIX=16 file with BSCALE/BZERO by hand."""
        from lightcurver_tpu.io.fits import read_fits

        cards = [
            "SIMPLE  =                    T",
            "BITPIX  =                   16",
            "NAXIS   =                    2",
            "NAXIS1  =                    4",
            "NAXIS2  =                    2",
            "BSCALE  =                  2.0",
            "BZERO   =                100.0",
            "END",
        ]
        head = "".join(c.ljust(80) for c in cards).encode()
        head += b" " * (-len(head) % 2880)
        raw = np.arange(8, dtype=">i2").tobytes()
        raw += b"\0" * (-len(raw) % 2880)
        path = tmp_path / "int.fits"
        path.write_bytes(head + raw)
        data, header = read_fits(path)
        np.testing.assert_allclose(
            data, np.arange(8).reshape(2, 4) * 2.0 + 100.0)


class TestTanWCS:
    def _wcs(self):
        from lightcurver_tpu.io.wcs import TanWCS

        scale = 0.21 / 3600.0  # deg/px
        return TanWCS(crval1=42.2, crval2=19.2, crpix1=50.5, crpix2=60.5,
                      cd=[[-scale, 0.0], [0.0, scale]])

    def test_roundtrip(self):
        wcs = self._wcs()
        for x, y in [(0.0, 0.0), (49.5, 59.5), (99.0, 119.0), (10.3, 77.8)]:
            ra, dec = wcs.pixel_to_world(x, y)
            x2, y2 = wcs.world_to_pixel(ra, dec)
            assert float(x2) == pytest.approx(x, abs=1e-6)
            assert float(y2) == pytest.approx(y, abs=1e-6)

    def test_reference_pixel_maps_to_crval(self):
        wcs = self._wcs()
        ra, dec = wcs.pixel_to_world(49.5, 59.5)
        assert float(ra) == pytest.approx(42.2, abs=1e-9)
        assert float(dec) == pytest.approx(19.2, abs=1e-9)

    def test_pixel_scale(self):
        assert self._wcs().pixel_scale_arcsec() == pytest.approx(0.21,
                                                                 rel=1e-6)

    def test_header_roundtrip(self):
        from lightcurver_tpu.io.fits import Header
        from lightcurver_tpu.io.wcs import TanWCS

        wcs = self._wcs()
        header = Header()
        header.update(wcs.to_header_cards())
        wcs2 = TanWCS.from_header(header)
        ra1, dec1 = wcs.pixel_to_world(12.0, 34.0)
        ra2, dec2 = wcs2.pixel_to_world(12.0, 34.0)
        assert float(ra1) == pytest.approx(float(ra2))
        assert float(dec1) == pytest.approx(float(dec2))

    def test_separation_small_angle(self):
        from lightcurver_tpu.utilities.coordinates import \
            angular_separation_deg

        # 1 arcsec offset in dec
        sep = angular_separation_deg(10.0, 20.0, 10.0, 20.0 + 1 / 3600.0)
        assert float(sep) * 3600 == pytest.approx(1.0, rel=1e-9)


class TestSipWCS:
    """SIP distortion (Shupe+ 2005): what astrometry.net solve-field
    writes as RA---TAN-SIP; the reference handles it via astropy.wcs."""

    def _wcs(self, with_inverse):
        from lightcurver_tpu.io.wcs import TanWCS

        # quadratic distortion, few-pixel amplitude at the field edge
        a = np.zeros((3, 3))
        b = np.zeros((3, 3))
        a[2, 0] = 2.0e-6
        a[0, 2] = -1.2e-6
        a[1, 1] = 0.8e-6
        b[2, 0] = -1.5e-6
        b[0, 2] = 1.0e-6
        kw = {}
        if with_inverse:
            # crude first-order inverse; Newton does the rest
            kw = {"sip_ap": -a, "sip_bp": -b}
        return TanWCS(150.1, -27.8, 1024.5, 1024.5,
                      [[-7.0e-5, 1.5e-6], [1.4e-6, 7.1e-5]],
                      sip_a=a, sip_b=b, **kw)

    def test_distortion_is_applied(self):
        wcs = self._wcs(False)
        # at the field corner the quadratic terms move the source by
        # pixels: pixel_to_world must differ from the SIP-less TAN
        from lightcurver_tpu.io.wcs import TanWCS

        plain = TanWCS(150.1, -27.8, 1024.5, 1024.5,
                       [[-7.0e-5, 1.5e-6], [1.4e-6, 7.1e-5]])
        ra1, dec1 = wcs.pixel_to_world(1900.0, 1900.0)
        ra0, dec0 = plain.pixel_to_world(1900.0, 1900.0)
        sep_deg = np.hypot((ra1 - ra0) * np.cos(np.deg2rad(dec0)),
                           dec1 - dec0)
        assert sep_deg * 3600.0 > 0.2  # arcsec-level at the corner
        # and the magnitude matches the polynomial directly
        u = 1900.0 + 1.0 - 1024.5
        du = 2.0e-6 * u**2 + 0.8e-6 * u * u - 1.2e-6 * u**2
        dv = -1.5e-6 * u**2 + 1.0e-6 * u**2
        expected_px = np.hypot(du, dv)
        assert sep_deg / 7.05e-5 == pytest.approx(expected_px, rel=0.05)

    @pytest.mark.parametrize("with_inverse", [False, True])
    def test_roundtrip_subpixel(self, with_inverse):
        wcs = self._wcs(with_inverse)
        xs = np.array([10.0, 500.0, 1024.0, 1700.0, 2000.0])
        ys = np.array([2000.0, 1500.0, 1024.0, 300.0, 15.0])
        ra, dec = wcs.pixel_to_world(xs, ys)
        x2, y2 = wcs.world_to_pixel(ra, dec)
        np.testing.assert_allclose(x2, xs, atol=1e-5)
        np.testing.assert_allclose(y2, ys, atol=1e-5)

    def test_header_roundtrip(self):
        from lightcurver_tpu.io.wcs import TanWCS

        wcs = self._wcs(True)
        cards = wcs.to_header_cards()
        assert cards["CTYPE1"] == "RA---TAN-SIP"
        wcs2 = TanWCS.from_header({k: str(v) for k, v in cards.items()})
        ra1, dec1 = wcs.pixel_to_world(1800.0, 200.0)
        ra2, dec2 = wcs2.pixel_to_world(1800.0, 200.0)
        assert ra1 == pytest.approx(ra2, abs=1e-10)
        assert dec1 == pytest.approx(dec2, abs=1e-10)

    def test_plain_tan_unchanged(self):
        from lightcurver_tpu.io.wcs import TanWCS

        wcs = TanWCS(150.1, -27.8, 1024.5, 1024.5,
                     [[-7.0e-5, 1.5e-6], [1.4e-6, 7.1e-5]])
        assert not wcs.has_sip
        assert "A_ORDER" not in wcs.to_header_cards()
        ra, dec = wcs.pixel_to_world(100.0, 200.0)
        x, y = wcs.world_to_pixel(ra, dec)
        assert x == pytest.approx(100.0, abs=1e-8)
        assert y == pytest.approx(200.0, abs=1e-8)


def test_upsampled_wcs_exact_fine_grid_alignment():
    """Fine pixel s*x + (s-1)/2 must hit the same sky as data pixel x.

    The pool-center convention of the numerical core (core/grids.py);
    the reference's plain crpix *= s misses the (s-1)/2 offset.  SIP
    coefficients rescale with the grid.
    """
    from lightcurver_tpu.io.wcs import TanWCS, upsampled_wcs

    a = np.zeros((3, 3))
    a[2, 0] = 1.5e-6
    a[0, 2] = -0.9e-6
    wcs = TanWCS(210.5, 11.25, 33.0, 31.0,
                 [[-5.5e-5, 1.0e-6], [0.9e-6, 5.6e-5]], sip_a=a)
    for s in (2, 3):
        fine = upsampled_wcs(wcs, s)
        xs = np.array([0.0, 10.0, 31.5, 63.0])
        ys = np.array([5.0, 20.0, 31.5, 1.0])
        ra_d, dec_d = wcs.pixel_to_world(xs, ys)
        ra_f, dec_f = fine.pixel_to_world(s * xs + (s - 1) / 2.0,
                                          s * ys + (s - 1) / 2.0)
        np.testing.assert_allclose(ra_f, ra_d, atol=1e-9)
        np.testing.assert_allclose(dec_f, dec_d, atol=1e-9)


class TestHeaderEdgeCases:
    def test_float64_bscale_keeps_precision(self, tmp_path):
        """BITPIX=-64 data with BSCALE/BZERO scales in float64 — a large
        BZERO offset must not eat half the significant digits."""
        from lightcurver_tpu.io.fits import read_fits

        cards = [
            "SIMPLE  =                    T",
            "BITPIX  =                  -64",
            "NAXIS   =                    2",
            "NAXIS1  =                    2",
            "NAXIS2  =                    1",
            "BSCALE  =                  1.0",
            "BZERO   =                1.0E8",
            "END",
        ]
        head = "".join(c.ljust(80) for c in cards).encode()
        head += b" " * (-len(head) % 2880)
        raw = np.array([[1.25, 2.0 + 1e-7]], dtype=">f8")
        body = raw.tobytes()
        body += b"\x00" * (-len(body) % 2880)
        path = tmp_path / "f64.fits"
        path.write_bytes(head + body)
        out, _ = read_fits(path)
        assert out.dtype == np.float64
        np.testing.assert_allclose(
            out, np.array([[1e8 + 1.25, 1e8 + 2.0 + 1e-7]]), rtol=0,
            atol=1e-7)

    def test_cd_matrix_without_cd1_1(self):
        """A ~90deg-rotated solution whose writer omitted the zero CD1_1
        (FITS: missing CDj_i default to 0 when any is present) must still
        be read as a CD matrix, not fall back to 1 deg/px CDELT."""
        from lightcurver_tpu.io.fits import Header
        from lightcurver_tpu.io.wcs import TanWCS

        header = Header()
        for k, v in [("CTYPE1", "RA---TAN"), ("CTYPE2", "DEC--TAN"),
                     ("CRVAL1", 42.2), ("CRVAL2", 19.2),
                     ("CRPIX1", 50.5), ("CRPIX2", 60.5),
                     ("CD1_2", 5.8e-5), ("CD2_1", -5.8e-5)]:
            header[k] = v
        wcs = TanWCS.from_header(header)
        assert wcs.pixel_scale_arcsec() == pytest.approx(5.8e-5 * 3600,
                                                         rel=1e-6)

    def test_pc_matrix_without_pc1_1(self):
        """PC detection must fire on any PCj_i card.  PC defaults are
        the IDENTITY, so PC1_2=1/PC2_1=-1 alone means [[1,1],[-1,1]]
        (scale x sqrt2) — the CDELT/CROTA2 fallback would give the bare
        CDELT scale instead, which is how we detect the branch."""
        from lightcurver_tpu.io.fits import Header
        from lightcurver_tpu.io.wcs import TanWCS

        header = Header()
        for k, v in [("CTYPE1", "RA---TAN"), ("CTYPE2", "DEC--TAN"),
                     ("CRVAL1", 42.2), ("CRVAL2", 19.2),
                     ("CRPIX1", 50.5), ("CRPIX2", 60.5),
                     ("CDELT1", 5.8e-5), ("CDELT2", 5.8e-5),
                     ("PC1_2", 1.0), ("PC2_1", -1.0)]:
            header[k] = v
        wcs = TanWCS.from_header(header)
        assert wcs.pixel_scale_arcsec() == pytest.approx(
            5.8e-5 * 3600 * np.sqrt(2.0), rel=1e-6)


class TestReviewRound3Fixes:
    """Round-3 review findings: commentary cards, numpy bools, int32
    scaling precision, antipode projection, RA-wrap-safe footprints."""

    def test_comment_history_cards_roundtrip(self, tmp_path):
        """COMMENT/HISTORY are commentary keywords: free text in columns
        9-80, NO value indicator — and they survive a write/read."""
        from lightcurver_tpu.io.fits import (Header, _format_card,
                                             read_fits, write_fits)

        card = _format_card("COMMENT", "reduced by lightcurver_tpu")
        assert card[:8] == "COMMENT "
        assert "=" not in card.split("lightcurver_tpu")[0]
        header = Header([("COMMENT", "first note", ""),
                         ("HISTORY", "solved 2026-08-17", ""),
                         ("GAIN", 1.5, "")])
        path = tmp_path / "comments.fits"
        write_fits(path, np.zeros((4, 4), np.float32), header)
        _, h = read_fits(path)
        cards = {k: v for k, v, _ in h.cards()}
        assert cards["COMMENT"] == "first note"
        assert cards["HISTORY"] == "solved 2026-08-17"
        assert h["GAIN"] == 1.5

    def test_numpy_bool_header_value(self, tmp_path):
        """np.bool_ values must be written as logical T/F, not the
        truthy 8-char string 'True'/'False'."""
        from lightcurver_tpu.io.fits import Header, read_fits, write_fits

        header = Header()
        header["SOLVED"] = np.bool_(False)
        header["OK"] = np.bool_(True)
        path = tmp_path / "npbool.fits"
        write_fits(path, np.zeros((2, 2), np.float32), header)
        _, h = read_fits(path)
        assert h["SOLVED"] is False
        assert h["OK"] is True

    def test_int32_bzero_unsigned_precision(self, tmp_path):
        """BITPIX=32 + BZERO=2^31 (the standard unsigned-32 encoding)
        must scale through float64: float32 would quantize values near
        4.29e9 by up to 128 counts."""
        from lightcurver_tpu.io.fits import BLOCK, read_fits

        values = np.array([[2**31 - 1, 2**31 - 129],
                           [-2**31, 0]], dtype=">i4")
        cards = [
            "SIMPLE  =                    T",
            "BITPIX  =                   32",
            "NAXIS   =                    2",
            "NAXIS1  =                    2",
            "NAXIS2  =                    2",
            "BZERO   =           2147483648",
            "BSCALE  =                    1",
            "END",
        ]
        head = "".join(c.ljust(80) for c in cards).encode()
        head += b" " * (-len(head) % BLOCK)
        raw = values.tobytes()
        raw += b"\0" * (-len(raw) % BLOCK)
        path = tmp_path / "u32.fits"
        path.write_bytes(head + raw)
        data, _ = read_fits(path)
        assert data.dtype == np.float64
        # exact unsigned values — float32 would round both to 2**32
        assert data[0, 0] == 2.0**32 - 1
        assert data[0, 1] == 2.0**32 - 129
        assert data[1, 0] == 0.0

    def test_antipode_does_not_project_into_image(self):
        """Points 90+ degrees from the tangent point have no gnomonic
        projection: world_to_pixel must NaN them out (previously the
        sign flip projected the ANTIPODE into the image and
        contains_world returned a false positive)."""
        from lightcurver_tpu.io.wcs import TanWCS

        scale = 0.21 / 3600.0
        wcs = TanWCS(crval1=42.2, crval2=19.2, crpix1=50.5, crpix2=60.5,
                     cd=[[-scale, 0.0], [0.0, scale]])
        # the exact antipode previously landed exactly on CRPIX
        x, y = wcs.world_to_pixel(42.2 + 180.0, -19.2)
        assert np.isnan(float(x)) and np.isnan(float(y))
        assert not wcs.contains_world(42.2 + 180.0, -19.2, (120, 100))
        # in-image points are untouched
        assert wcs.contains_world(42.2, 19.2, (120, 100))

    def test_footprint_polygon_continuous_across_ra_zero(self):
        """A field straddling RA = 0 must yield corners continuous
        around CRVAL1, not a mix of ~359.9 and ~0.1."""
        from lightcurver_tpu.io.wcs import TanWCS

        scale = 30.0 / 3600.0  # wide field so corners cross the seam
        wcs = TanWCS(crval1=0.02, crval2=10.0, crpix1=25.0, crpix2=25.0,
                     cd=[[-scale, 0.0], [0.0, scale]])
        corners = np.array(wcs.footprint_polygon((50, 50)))
        assert corners[:, 0].max() - corners[:, 0].min() < 1.0
        assert np.all(np.abs(corners[:, 0] - 0.02) < 1.0)


def test_nonfinite_float_card_written_as_legal_string(tmp_path):
    """FITS has no NaN card value: a raw-instrument NaN float card must
    be written as a quoted string (legal FITS), never the bare illegal
    token 'nan'."""
    import numpy as np

    from lightcurver_tpu.io.fits import Header, read_fits, write_fits

    h = Header()
    h["FOCUSPOS"] = float("nan")
    h["SPEED"] = float("inf")
    h["GOOD"] = 1.25
    path = tmp_path / "nan_card.fits"
    write_fits(path, np.zeros((4, 4), np.float32), h)
    raw = path.read_bytes()[:2880].decode("ascii", errors="replace")
    assert "= nan" not in raw and "= inf" not in raw
    _, back = read_fits(path)
    assert np.isnan(float(back["FOCUSPOS"]))
    assert np.isinf(float(back["SPEED"]))
    assert back["GOOD"] == 1.25


class TestFitsFormatDiversity:
    """Real-world FITS diversity (VERDICT r3 #6): whole-file gzip,
    tile-compressed HDU refusal, table-extension refusal, nonstandard
    BITPIX refusal, and CD vs PC+CDELT vs CROTA2 WCS equivalence."""

    def test_gzip_fits_transparent_read(self, tmp_path):
        import gzip

        from lightcurver_tpu.io.fits import Header, read_fits, write_fits

        img = np.arange(48, dtype=np.float32).reshape(6, 8) / 7.0
        h = Header()
        h["MJD-OBS"] = 60001.25
        plain = tmp_path / "f.fits"
        write_fits(plain, img, h)
        gz = tmp_path / "f.fits.gz"
        gz.write_bytes(gzip.compress(plain.read_bytes()))

        data, header = read_fits(gz)
        np.testing.assert_array_equal(data, img)
        assert header["MJD-OBS"] == 60001.25
        # memmap on a gzipped file must fall back to an eager read,
        # never map compressed bytes as pixels
        data2, _ = read_fits(gz, memmap=True)
        np.testing.assert_array_equal(np.asarray(data2), img)
        assert not isinstance(data2, np.memmap)

    @staticmethod
    def _hdu_bytes(cards):
        from lightcurver_tpu.io.fits import BLOCK, CARD, _format_card

        text = "".join(_format_card(k, v) for k, v in cards)
        text += "END".ljust(CARD)
        text += " " * (-len(text) % BLOCK)
        return text.encode("latin-1")

    def test_tile_compressed_hdu_typed_refusal(self, tmp_path):
        from lightcurver_tpu.io.fits import (BLOCK, UnsupportedFitsFeature,
                                             read_fits)

        primary = self._hdu_bytes([("SIMPLE", True), ("BITPIX", 8),
                                   ("NAXIS", 0), ("EXTEND", True)])
        nrows, rowlen, heap = 4, 16, 64
        comp = self._hdu_bytes([
            ("XTENSION", "BINTABLE"), ("BITPIX", 8), ("NAXIS", 2),
            ("NAXIS1", rowlen), ("NAXIS2", nrows), ("PCOUNT", heap),
            ("GCOUNT", 1), ("TFIELDS", 1), ("ZIMAGE", True),
            ("ZCMPTYPE", "RICE_1"), ("ZBITPIX", 16),
        ])
        payload = bytes(nrows * rowlen + heap)
        payload += b"\0" * (-len(payload) % BLOCK)
        path = tmp_path / "rice.fits"
        path.write_bytes(primary + comp + payload)

        with pytest.raises(UnsupportedFitsFeature, match="RICE_1.*funpack"):
            read_fits(path, hdu_index=1)
        # header-only access still works (e.g. for diagnostics)
        _, h = read_fits(path, hdu_index=1, header_only=True)
        assert h["ZCMPTYPE"] == "RICE_1"

    def test_table_extension_refused_as_image(self, tmp_path):
        from lightcurver_tpu.io.fits import (BLOCK, UnsupportedFitsFeature,
                                             read_fits)

        primary = self._hdu_bytes([("SIMPLE", True), ("BITPIX", 8),
                                   ("NAXIS", 0), ("EXTEND", True)])
        table = self._hdu_bytes([
            ("XTENSION", "BINTABLE"), ("BITPIX", 8), ("NAXIS", 2),
            ("NAXIS1", 8), ("NAXIS2", 2), ("PCOUNT", 0), ("GCOUNT", 1),
            ("TFIELDS", 1),
        ])
        payload = bytes(16)
        payload += b"\0" * (-len(payload) % BLOCK)
        path = tmp_path / "table.fits"
        path.write_bytes(primary + table + payload)
        with pytest.raises(UnsupportedFitsFeature, match="BINTABLE"):
            read_fits(path, hdu_index=1)

    def test_nonstandard_bitpix_refused(self, tmp_path):
        from lightcurver_tpu.io.fits import (BLOCK, UnsupportedFitsFeature,
                                             read_fits)

        hdu = self._hdu_bytes([("SIMPLE", True), ("BITPIX", 24),
                               ("NAXIS", 2), ("NAXIS1", 4), ("NAXIS2", 4)])
        payload = bytes(48)
        payload += b"\0" * (-len(payload) % BLOCK)
        path = tmp_path / "weird.fits"
        path.write_bytes(hdu + payload)
        with pytest.raises(UnsupportedFitsFeature, match="BITPIX=24"):
            read_fits(path)

    def test_cd_pc_crota_wcs_equivalence(self):
        """The three header conventions describe the SAME transform."""
        import math

        from lightcurver_tpu.io.wcs import TanWCS

        scale, rho = 0.2 / 3600.0, math.radians(23.0)
        c, s_ = math.cos(rho), math.sin(rho)
        # the classic AIPS CROTA2 matrix with cdelt = (-scale, +scale):
        # CD = [[cdelt1 c, -cdelt2 s], [cdelt1 s, cdelt2 c]]
        cd = [[-scale * c, -scale * s_], [-scale * s_, scale * c]]
        base = {"CTYPE1": "RA---TAN", "CTYPE2": "DEC--TAN",
                "CRVAL1": 42.2, "CRVAL2": 19.2, "CRPIX1": 40.5,
                "CRPIX2": 38.5}
        w_cd = TanWCS.from_header({
            **base, "CD1_1": cd[0][0], "CD1_2": cd[0][1],
            "CD2_1": cd[1][0], "CD2_2": cd[1][1]})
        # PC + CDELT: cd = diag(cdelt) @ pc -> pc = diag(1/cdelt) @ cd
        w_pc = TanWCS.from_header({
            **base, "CDELT1": -scale, "CDELT2": scale,
            "PC1_1": c, "PC1_2": s_, "PC2_1": -s_, "PC2_2": c})
        # CROTA2 convention (no skew)
        w_rot = TanWCS.from_header({
            **base, "CDELT1": -scale, "CDELT2": scale, "CROTA2": 23.0})
        xs = np.array([0.0, 17.3, 71.9])
        ys = np.array([0.0, 64.2, 8.8])
        ra_cd, dec_cd = w_cd.pixel_to_world(xs, ys)
        for w in (w_pc, w_rot):
            ra, dec = w.pixel_to_world(xs, ys)
            np.testing.assert_allclose(ra, ra_cd, atol=1e-10)
            np.testing.assert_allclose(dec, dec_cd, atol=1e-10)
