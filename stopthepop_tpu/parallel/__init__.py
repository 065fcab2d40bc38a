from .train import make_mesh, make_sharded_train_step, shard_model  # noqa: F401
