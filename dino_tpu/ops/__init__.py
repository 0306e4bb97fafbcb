from dino_tpu.ops.attention import (attention_xla, flash_attention,
                                    multi_head_attention)
from dino_tpu.ops.bicubic import bicubic_resize_matrix
from dino_tpu.ops.preprocess import normalize_imagenet, preprocess
from dino_tpu.ops.resize import resize_bilinear, resize_nearest
from dino_tpu.ops.upsample import kron_upsample
