from .mesh import epoch_mesh
from .deconv import shard_consts, shard_pytree, sharded_deconv_step, \
    fit_deconv_sharded, pad_epochs

__all__ = [
    "epoch_mesh",
    "shard_consts",
    "shard_pytree",
    "sharded_deconv_step",
    "fit_deconv_sharded",
    "pad_epochs",
]
