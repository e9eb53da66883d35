"""Pixel-coordinate rescaling for the PSF field-distortion model.

Matches the reference convention (lightcurver/utilities/image_coordinates.py:4-25):
origin moves to the image center and coordinates are divided by the image
dimensions, so the frame spans about [-1/2, 1/2] per axis.  The distortion
polynomials (core/psf/distortion.py) are defined on these coordinates.
"""

import numpy as np


def rescale_image_coordinates(xy_coordinates_array, image_shape):
    """(N, 2) pixel (x, y) with origin bottom-left -> centered/rescaled.

    Args:
        xy_coordinates_array: (N, 2) array of (x, y) pixel pairs.
        image_shape: the image's ``.shape`` (ny, nx).

    Returns:
        (N, 2) array: origin at the image center, divided by (nx, ny).
    """
    dims = np.array(image_shape, dtype=float)[::-1]  # (nx, ny)
    center = (dims - 1.0) / 2.0
    return (np.asarray(xy_coordinates_array, dtype=float) - center) / dims
