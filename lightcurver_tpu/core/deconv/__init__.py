from .model import DeconvModel, setup_model
from .loss import Loss, Prior
