from .mesh import epoch_mesh
from .deconv import shard_consts, shard_pytree, sharded_deconv_step, \
    fit_deconv_sharded, pad_epoch_stacks

__all__ = [
    "epoch_mesh",
    "shard_consts",
    "shard_pytree",
    "sharded_deconv_step",
    "fit_deconv_sharded",
    "pad_epoch_stacks",
]
