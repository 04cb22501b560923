from .mesh import make_mesh, DATA_AXIS, MODEL_AXIS
from .sharded_read import sharded_bank_attention_read, shard_bank_state
from .sharded_update import sharded_bank_merge_append

__all__ = ["make_mesh", "DATA_AXIS", "MODEL_AXIS",
           "sharded_bank_attention_read", "shard_bank_state",
           "sharded_bank_merge_append"]
