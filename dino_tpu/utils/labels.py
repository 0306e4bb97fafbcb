"""labels.txt parsing with the __ignore__/_background_ convention.

Spec: dt_utils.py:117-131 — line 0 must be ``__ignore__`` (class id -1,
excluded), line 1 must be ``_background_`` (class id 0).
"""
from __future__ import annotations

from typing import Dict, Tuple


def parse_class_names(path: str) -> Tuple[Tuple[str, ...], Dict[str, int]]:
    class_names = []
    class_name_to_id: Dict[str, int] = {}
    with open(path) as f:
        for i, line in enumerate(f.readlines()):
            class_id = i - 1  # starts with -1
            class_name = line.strip()
            class_name_to_id[class_name] = class_id
            if class_id == -1:
                assert class_name == "__ignore__"
                continue
            elif class_id == 0:
                assert class_name == "_background_"
            class_names.append(class_name)
    return tuple(class_names), class_name_to_id
