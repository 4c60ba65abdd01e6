#!/usr/bin/env python
"""Inference CLI shim — see image_super_resolution_tpu/cli/rs.py."""
from image_super_resolution_tpu.cli.rs import main

if __name__ == "__main__":
    main()
