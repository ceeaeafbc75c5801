"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding code is
exercised without a TPU slice (the idiomatic JAX approach — SURVEY.md §4).
The env vars must be set before jax is first imported anywhere.
"""

import os
import sys
import pathlib

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# This machine's sitecustomize force-registers the axon TPU plugin and resets
# jax_platforms to include it; override back to CPU *after* import, before any
# backend is touched, so tests never ride the TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from vision_assist_tpu.utils.cache import enable as _enable_cache  # noqa: E402

_enable_cache()

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
