from .mesh import (make_mesh, shard, replicate, col_sharding, row_sharding,
                   grid_sharding, placements_for, apply_placements,
                   init_distributed)

__all__ = ["make_mesh", "shard", "replicate", "col_sharding", "row_sharding",
           "grid_sharding", "placements_for", "apply_placements",
           "init_distributed"]
