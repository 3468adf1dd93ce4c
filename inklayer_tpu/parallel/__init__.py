from inklayer_tpu.parallel.mesh import make_mesh
from inklayer_tpu.parallel.sharding import param_sharding_rules, shard_params

__all__ = ["make_mesh", "param_sharding_rules", "shard_params"]
