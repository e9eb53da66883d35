"""User-config loading and validation.

One YAML file, addressed by the ``LIGHTCURVER_CONFIG`` environment
variable; loaded fresh by every component (reference
lightcurver/structure/user_config.py:11-85).  The key namespace is the
reference's — it is validated by set-difference against the shipped
example config (pipeline/example_config_file/config.yaml), exactly like
the reference (user_config.py:88-112).
"""

import os
from pathlib import Path

import yaml

from .exceptions import NoConfigFilePathInEnvironment
from ..utilities.coordinates import SkyCoord

_GAIA_BANDS = ("r_sdss", "i_sdss", "g_sdss", "V", "R", "Ic", "B_T", "V_T")


def _as_name_list(value):
    """'abcd' -> ['a','b','c','d']; 'aa,ab' -> ['aa','ab'];
    lists/None pass through.

    Character-splitting is the reference's semantics (reference
    structure/user_config.py:50-60) but silently mis-parses the
    multi-character spreadsheet names fields with > 26 stars get
    ('aa', 'ab', ... — utilities/star_naming.py): "aa" became
    ['a', 'a'].  Comma-separated strings (and YAML lists) express
    those; bare strings keep reference behavior.
    """
    if isinstance(value, str):
        if "," in value:
            return [v.strip() for v in value.split(",") if v.strip()]
        return list(value)
    return value


def get_user_config():
    """Load, derive and return the configuration dictionary."""
    if "LIGHTCURVER_CONFIG" not in os.environ:
        raise NoConfigFilePathInEnvironment
    with open(os.environ["LIGHTCURVER_CONFIG"]) as f:
        config = yaml.safe_load(f)

    # ROI: single-entry mapping name -> {coordinates: [ra, dec]}
    roi_name = list(config["ROI"].keys())[0]
    config["roi_name"] = roi_name
    ra, dec = config["ROI"][roi_name]["coordinates"]
    config["ROI_ra_deg"] = ra
    config["ROI_dec_deg"] = dec
    config["ROI_SkyCoord"] = SkyCoord(ra, dec)

    assert "raw_dirs" in config
    raw = config["raw_dirs"]
    config["raw_dirs"] = ([Path(p) for p in raw] if isinstance(raw, list)
                          else [Path(raw)])

    assert "workdir" in config
    workdir = Path(config["workdir"])
    config["workdir"] = workdir
    config["database_path"] = workdir / "database.sqlite3"
    config["plots_dir"] = workdir / "plots"
    config["logs_dir"] = workdir / "logs"
    config["frames_dir"] = workdir / "frames"
    config["regions_path"] = workdir / "regions.h5"
    config["psfs_path"] = workdir / "psfs.h5"
    # user-provided override arrives as a YAML string; downstream code
    # calls .parent/.mkdir on it
    if config.get("prepared_roi_cutouts_path"):
        config["prepared_roi_cutouts_path"] = Path(
            config["prepared_roi_cutouts_path"])
    for d in ("plots_dir", "logs_dir", "frames_dir"):
        config[d].mkdir(parents=True, exist_ok=True)

    for key in ("stars_to_use_psf", "stars_to_use_norm",
                "stars_to_exclude_psf", "stars_to_exclude_norm"):
        config[key] = _as_name_list(config[key])

    band = config["photometric_band"]
    if band in _GAIA_BANDS:
        config["reference_absolute_photometric_survey"] = "gaia"
    elif "panstarrs" in band:
        if dec < -30.5:
            raise RuntimeError(
                "With this declination, it is unlikely you will find "
                "pan-starrs magnitudes for absolute calibration.")
        config["reference_absolute_photometric_survey"] = "panstarrs"
    else:
        raise RuntimeError(
            f"Config check: not a photometric band we implemented: {band}")

    config.setdefault("constraints_on_frame_columns_for_roi", {})
    config.setdefault("constraints_on_normalization_coeff", {})
    config.setdefault("fix_point_source_astrometry", False)
    config.setdefault("deconv_checkpoint_every", 0)
    config.setdefault("psf_do_plots", 1)
    config.setdefault("star_fit_batch_size", 32)
    # absent key == null: the ROI tasks derive the workdir default
    # themselves (a missing key otherwise KeyErrors at the LAST two
    # pipeline stages for notebook users bypassing the template check)
    config.setdefault("prepared_roi_cutouts_path", None)
    # production default 16 (round-4 decision): the PSF fit pins star
    # positions at the stamp centre (|x0| <= 3 data px by bound), so
    # the reduced L = m + 2*16 DFT padding is exact up to <= 1.8e-5
    # relative flux (float64-quantified, tools/exp_psf_mxu.py) while
    # cutting the fit's modulated-matmul FLOPs ~3x (measured on-chip:
    # 7.58 -> 9.26 fits/s at equal chi2).  Set null for the full L=2m
    # padding (bit-exact for arbitrary in-stamp placement).
    # the default scales with the subsampling factor: psf_fft_length
    # requires pad >= 4*s (wrap-free margin for the |x0| <= 3 data px
    # position bound), so a bare 16 would hard-fail previously-working
    # configs with subsampling_factor > 4
    config.setdefault(
        "psf_dft_pad", max(16, 4 * int(config.get("subsampling_factor", 2))))
    config["checkpoints_dir"] = workdir / "checkpoints"
    return config


def compare_config_with_pipeline_delivered_one():
    """Set-difference of user config keys vs the shipped example config."""
    if "LIGHTCURVER_CONFIG" not in os.environ:
        raise NoConfigFilePathInEnvironment
    with open(os.environ["LIGHTCURVER_CONFIG"]) as f:
        user = yaml.safe_load(f)

    template_path = (Path(__file__).parent.parent / "pipeline"
                     / "example_config_file" / "config.yaml")
    with open(template_path) as f:
        template = yaml.safe_load(f)

    user_keys, template_keys = set(user), set(template)
    missing = template_keys - user_keys
    return {
        "extra_keys_in_user_config": user_keys - template_keys,
        "extra_keys_in_pipeline_config": missing,
        "pipeline_extra_keys_values": {k: template[k] for k in missing},
    }
