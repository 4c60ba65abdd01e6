#!/usr/bin/env python
"""Out-of-box demo shim — see image_super_resolution_tpu/cli/demo.py."""
from image_super_resolution_tpu.cli.demo import main

if __name__ == "__main__":
    main()
