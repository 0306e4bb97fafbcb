from dino_tpu.models.heads import (head_apply, init_head, init_linear_head,
                                   init_mlp_head, linear_head_apply,
                                   mlp_head_apply)
from dino_tpu.models.vit import (ViTConfig, forward_mask,
                                 get_intermediate_layers,
                                 get_last_selfattention, init_vit_params,
                                 interpolate_pos_encoding, prepare_tokens,
                                 truncate_blocks, vit_base, vit_forward,
                                 vit_small, vit_tiny)
