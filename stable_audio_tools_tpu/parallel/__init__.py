from .mesh import create_mesh, shard_batch, replicate_tree, zero_shard_opt_state
