"""lightcurver_tpu: TPU-native forward-modelling photometry pipeline.

Public surface: the pipeline shell (WorkflowManager + `lc_run`/`lc_init`)
and the numerical core (PSF building, joint deconvolution) re-exported
here for notebook use.
"""

__version__ = "0.1.0"

from .core.psf.build import build_psf                       # noqa: F401
from .core.psf.batched import build_psf_batched             # noqa: F401
from .core.psf.distortion import apply_distortion           # noqa: F401
from .core.deconv.model import setup_model, DeconvModel     # noqa: F401
from .core.deconv.loss import Loss, Prior                   # noqa: F401
from .core.deconv.batched import fit_stars_batched          # noqa: F401
from .core.params import Params                             # noqa: F401
from .core.optimize import (Optimizer,                      # noqa: F401
                            CheckpointMismatch)
from .core.noise import propagate_noise                     # noqa: F401
from .core.fisher import (get_flux_uncertainties,           # noqa: F401
                          FisherCovariance)
