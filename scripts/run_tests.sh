#!/bin/bash
# Test runner: forces CPU and skips axon TPU-plugin registration entirely
# (the sitecustomize dials the TPU relay in EVERY python process otherwise,
# which can disturb long-running TPU jobs like training).
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest "$@"
