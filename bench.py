#!/usr/bin/env python
"""Driver benchmark entry point — prints ONE JSON line.

Implementation lives in dino_tpu.cli.bench (also installed as `dt-bench`).
"""
from dino_tpu.cli.bench import main

if __name__ == "__main__":
    main()
