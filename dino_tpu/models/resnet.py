"""ResNet-50 CNN backbones (reference 'cnn1'/'cnn2' baselines).

Spec: pl_torch_modules.py:184-214 — truncated DINO-pretrained ResNet-50
(conv1..layer2 for cnn1; ..layer3[0:2] + upconv/conv for cnn2) used as rough
benchmarks against the 1-/3-block ViT.  Implementation lands in a later
milestone of this round; the ViT path is the production backbone.
"""
from __future__ import annotations

_IMPLEMENTED = frozenset()  # becomes {"cnn1", "cnn2"} when resnet lands


def available(name: str) -> bool:
    return name in _IMPLEMENTED
