#!/usr/bin/env python
"""Torch-artifact import shim — see image_super_resolution_tpu/cli/import_torch.py."""
from image_super_resolution_tpu.cli.import_torch import main

if __name__ == "__main__":
    main()
