from .convert import (convert_afb_urr_checkpoint, convert_afb_urr_state_dict,
                      torch_conv_to_flax)
from .checkpoint import (save_checkpoint, restore_checkpoint,
                         save_flat_npz, load_flat_npz)

__all__ = ["convert_afb_urr_checkpoint", "torch_conv_to_flax",
           "save_checkpoint", "restore_checkpoint",
           "save_flat_npz", "load_flat_npz"]
