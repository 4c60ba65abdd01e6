#!/usr/bin/env python
"""Evaluation CLI shim — see image_super_resolution_tpu/cli/evaluate.py."""
from image_super_resolution_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()
