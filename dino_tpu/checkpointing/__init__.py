from dino_tpu.checkpointing.io import (flatten_params, load_checkpoint,
                                       save_checkpoint, unflatten_params)
from dino_tpu.checkpointing.torch_convert import (convert_dino_pretrain,
                                                  convert_head_state_dict,
                                                  convert_pl_checkpoint,
                                                  convert_vit_state_dict,
                                                  state_dict_to_numpy)
