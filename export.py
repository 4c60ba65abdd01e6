#!/usr/bin/env python
"""Export CLI shim — see image_super_resolution_tpu/cli/export.py."""
from image_super_resolution_tpu.cli.export import main

if __name__ == "__main__":
    main()
