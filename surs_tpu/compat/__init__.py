from .torch_import import (import_torch_state_dict, load_torch_checkpoint,
                           load_params)

__all__ = ["import_torch_state_dict", "load_torch_checkpoint",
           "load_params"]
