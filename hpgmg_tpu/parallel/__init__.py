from hpgmg_tpu.parallel.mesh import (make_mesh, level_sharding, shard_hierarchy,
                                     shard_array)

__all__ = ["make_mesh", "level_sharding", "shard_hierarchy", "shard_array"]
