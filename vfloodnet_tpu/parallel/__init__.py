from .mesh import make_mesh, DATA_AXIS, MODEL_AXIS
from .sharded_read import sharded_bank_attention_read, shard_bank_state

__all__ = ["make_mesh", "DATA_AXIS", "MODEL_AXIS",
           "sharded_bank_attention_read", "shard_bank_state"]
