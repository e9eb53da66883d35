"""TAN (gnomonic) WCS: the projection the pipeline's frames use.

astropy.wcs is unavailable; this implements the FITS WCS paper-II TAN
projection with a CD matrix — the subset the reference exercises through
astropy (pixel<->world for cutout centring, footprints, pixel scale,
north angle; reference processes/plate_solving.py:69-138,
utilities/footprint.py:202-224).

Conventions: pixel coordinates are 0-based (x along columns / NAXIS1,
y along rows / NAXIS2); CRPIX is 1-based as in FITS.  All angles degrees.
"""

import math

import numpy as np

DEG = math.pi / 180.0


class TanWCS:
    """TAN projection with CD matrix."""

    def __init__(self, crval1, crval2, crpix1, crpix2, cd):
        self.crval1 = float(crval1)
        self.crval2 = float(crval2)
        self.crpix1 = float(crpix1)
        self.crpix2 = float(crpix2)
        self.cd = np.asarray(cd, dtype=float).reshape(2, 2)
        self._cd_inv = np.linalg.inv(self.cd)

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_header(cls, header):
        """Build from FITS cards: CD matrix, or PC matrix, or CDELT/CROTA2."""
        ctype1 = str(header.get("CTYPE1", "RA---TAN"))
        if "TAN" not in ctype1:
            raise ValueError(f"only TAN projection supported, got {ctype1}")
        crval1 = float(header["CRVAL1"])
        crval2 = float(header["CRVAL2"])
        crpix1 = float(header["CRPIX1"])
        crpix2 = float(header["CRPIX2"])
        if "CD1_1" in header:
            cd = [[header.get("CD1_1", 0.0), header.get("CD1_2", 0.0)],
                  [header.get("CD2_1", 0.0), header.get("CD2_2", 0.0)]]
        elif "PC1_1" in header:
            cdelt1 = float(header.get("CDELT1", 1.0))
            cdelt2 = float(header.get("CDELT2", 1.0))
            pc = np.array([[header.get("PC1_1", 1.0), header.get("PC1_2", 0.0)],
                           [header.get("PC2_1", 0.0), header.get("PC2_2", 1.0)]],
                          dtype=float)
            cd = np.diag([cdelt1, cdelt2]) @ pc
        else:
            cdelt1 = float(header.get("CDELT1", 1.0))
            cdelt2 = float(header.get("CDELT2", 1.0))
            rho = float(header.get("CROTA2", 0.0)) * DEG
            cd = [[cdelt1 * math.cos(rho), -cdelt2 * math.sin(rho)],
                  [cdelt1 * math.sin(rho), cdelt2 * math.cos(rho)]]
        return cls(crval1, crval2, crpix1, crpix2, cd)

    def to_header_cards(self):
        """Dict of FITS cards describing this WCS."""
        return {
            "CTYPE1": "RA---TAN", "CTYPE2": "DEC--TAN",
            "CRVAL1": self.crval1, "CRVAL2": self.crval2,
            "CRPIX1": self.crpix1, "CRPIX2": self.crpix2,
            "CD1_1": self.cd[0, 0], "CD1_2": self.cd[0, 1],
            "CD2_1": self.cd[1, 0], "CD2_2": self.cd[1, 1],
            "CUNIT1": "deg", "CUNIT2": "deg",
        }

    # -- transforms ----------------------------------------------------------

    def pixel_to_world(self, x, y):
        """0-based pixel (x, y) -> (ra, dec) degrees.  Vectorized."""
        x = np.asarray(x, dtype=float)
        y = np.asarray(y, dtype=float)
        u = x + 1.0 - self.crpix1
        v = y + 1.0 - self.crpix2
        xi = (self.cd[0, 0] * u + self.cd[0, 1] * v) * DEG
        eta = (self.cd[1, 0] * u + self.cd[1, 1] * v) * DEG
        ra0 = self.crval1 * DEG
        dec0 = self.crval2 * DEG
        denom = np.sqrt(1.0 + xi**2 + eta**2)
        sin_dec = (np.sin(dec0) + eta * np.cos(dec0)) / denom
        dec = np.arcsin(np.clip(sin_dec, -1.0, 1.0))
        ra = ra0 + np.arctan2(xi, np.cos(dec0) - eta * np.sin(dec0))
        return (np.mod(ra / DEG, 360.0), dec / DEG)

    def world_to_pixel(self, ra, dec):
        """(ra, dec) degrees -> 0-based pixel (x, y).  Vectorized."""
        ra = np.asarray(ra, dtype=float) * DEG
        dec = np.asarray(dec, dtype=float) * DEG
        ra0 = self.crval1 * DEG
        dec0 = self.crval2 * DEG
        dra = ra - ra0
        den = (np.sin(dec0) * np.sin(dec)
               + np.cos(dec0) * np.cos(dec) * np.cos(dra))
        xi = np.cos(dec) * np.sin(dra) / den / DEG
        eta = (np.cos(dec0) * np.sin(dec)
               - np.sin(dec0) * np.cos(dec) * np.cos(dra)) / den / DEG
        u = self._cd_inv[0, 0] * xi + self._cd_inv[0, 1] * eta
        v = self._cd_inv[1, 0] * xi + self._cd_inv[1, 1] * eta
        return (u + self.crpix1 - 1.0, v + self.crpix2 - 1.0)

    # -- derived quantities ---------------------------------------------------

    def pixel_scale_arcsec(self):
        """Geometric-mean pixel scale, arcsec/pixel."""
        return math.sqrt(abs(np.linalg.det(self.cd))) * 3600.0

    def pixel_anisotropy(self):
        """|sx - sy| / (sx + sy): the reference's bad-solution flag
        (processes/plate_solving.py:110-123)."""
        sx = math.hypot(self.cd[0, 0], self.cd[1, 0])
        sy = math.hypot(self.cd[0, 1], self.cd[1, 1])
        return abs(sx - sy) / (sx + sy)

    def north_angle_deg(self):
        """Position angle of celestial north measured from the +y axis of
        the image, counter-clockwise, degrees (utilities/footprint.py:202-224
        equivalent)."""
        cx, cy = self.crpix1 - 1.0, self.crpix2 - 1.0
        ra0, dec0 = self.pixel_to_world(cx, cy)
        step = 10.0 / 3600.0  # 10 arcsec north
        x1, y1 = self.world_to_pixel(ra0, dec0 + step)
        return math.degrees(math.atan2(-(x1 - cx), y1 - cy))

    def footprint_polygon(self, shape):
        """Corner (ra, dec) list for an image of ``shape`` (ny, nx)."""
        ny, nx = shape
        xs = np.array([0.0, nx - 1.0, nx - 1.0, 0.0])
        ys = np.array([0.0, 0.0, ny - 1.0, ny - 1.0])
        ra, dec = self.pixel_to_world(xs, ys)
        return list(zip(ra.tolist(), dec.tolist()))

    def contains_world(self, ra, dec, shape, margin_pixels=0.0):
        """Is (ra, dec) inside the image (with optional inner margin)?"""
        x, y = self.world_to_pixel(ra, dec)
        ny, nx = shape
        m = margin_pixels
        return bool(np.all((x >= m) & (x <= nx - 1 - m)
                           & (y >= m) & (y <= ny - 1 - m)))


def strip_wcs_cards(header):
    """Remove WCS-related cards from a Header in place (the reference strips
    and rebuilds WCS keywords on import, processes/frame_importation.py:97-115)."""
    prefixes = ("CTYPE", "CRVAL", "CRPIX", "CD1_", "CD2_", "CDELT", "CROTA",
                "PC1_", "PC2_", "CUNIT", "PV1_", "PV2_", "A_", "B_", "AP_",
                "BP_", "WCSAXES", "LONPOLE", "LATPOLE", "EQUINOX", "RADESYS")
    for key in list(header.keys()):
        if any(key.startswith(p) for p in prefixes):
            del header[key]
    return header
