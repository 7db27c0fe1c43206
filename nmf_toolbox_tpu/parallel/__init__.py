from .mesh import (make_mesh, shard, replicate, col_sharding, row_sharding,
                   grid_sharding, placements_for, apply_placements,
                   init_distributed)
from .padding import (mesh_multiples, pad_amount, pad_axes, plan_padding,
                      prepare_weights)

__all__ = ["make_mesh", "shard", "replicate", "col_sharding", "row_sharding",
           "grid_sharding", "placements_for", "apply_placements",
           "init_distributed", "mesh_multiples", "pad_amount", "pad_axes",
           "plan_padding", "prepare_weights"]
