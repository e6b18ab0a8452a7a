from .mesh import make_mesh, shard_batch
from .trainstep import TrainState, make_train_step, make_eval_step
