#!/usr/bin/env python
"""Repo-root CLI shim — mirrors the reference's `python main.py` entry point.

See `python -m vision_assist_tpu.main --help` for the full interface.
"""

import sys

from vision_assist_tpu.main import main

if __name__ == "__main__":
    sys.exit(main())
