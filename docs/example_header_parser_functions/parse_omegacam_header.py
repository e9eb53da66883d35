"""Example header parser for VST/OmegaCAM frames.

Copy into ``$workdir/header_parser/parse_header.py`` and adapt.  The
contract: receive the (concatenated) FITS header, return
``{'mjd', 'gain', 'exptime'}``.
"""

from datetime import datetime, timezone


def _iso_to_mjd(stamp):
    """ISO-8601 timestamp -> MJD (UTC)."""
    dt = datetime.fromisoformat(stamp.replace("Z", "+00:00"))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    # MJD 40587 = 1970-01-01
    return 40587.0 + dt.timestamp() / 86400.0


def parse_header(header):
    return {
        "exptime": header["exptime"],
        "gain": header["gain"],
        "mjd": _iso_to_mjd(header["obstart"]),
    }
