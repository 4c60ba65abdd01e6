#!/usr/bin/env python
"""Training CLI shim — see image_super_resolution_tpu/cli/train.py."""
from image_super_resolution_tpu.cli.train import main

if __name__ == "__main__":
    main()
