from .mesh import make_mesh, shard_params, param_sharding_spec  # noqa: F401
from .train import TrainState, make_train_step, train_step_dryrun  # noqa: F401
