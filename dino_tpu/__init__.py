"""dino_tpu: TPU-native coarse-segmentation framework (DINO ViT backbone).

Public surface mirrors the reference package (dt_segmentation/__init__.py):
DINOSeg, DuckieSegDataset, parse_class_names.
"""
from dino_tpu.api import DINOSeg
from dino_tpu.data.dataset import DuckieSegDataset
from dino_tpu.utils.labels import parse_class_names

__version__ = "0.1.0"
__all__ = ["DINOSeg", "DuckieSegDataset", "parse_class_names", "__version__"]
