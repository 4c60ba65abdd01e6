#!/usr/bin/env python
"""Manifest CLI shim — see image_super_resolution_tpu/cli/create_json.py."""
from image_super_resolution_tpu.cli.create_json import main

if __name__ == "__main__":
    main()
