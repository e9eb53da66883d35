from .build import build_psf
from .distortion import apply_distortion
