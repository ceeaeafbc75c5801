"""The multi-host layer must be inert single-process and honest about rank.

Real multi-process DCN runs need a pod; what CI pins is the contract: no
env => no-op (never touches jax.distributed), and process_info reports the
single-process identity. The mesh/sharding code itself is multi-process
ready because it only consumes jax.devices() (tests/test_multi_stream.py
exercises it over 8 virtual devices).
"""

import os

from vision_assist_tpu.parallel import distributed


def test_noop_without_env(monkeypatch):
    monkeypatch.delenv("VAT_COORDINATOR", raising=False)
    assert distributed.maybe_initialize() is False
    # Idempotent and still a no-op on repeat calls.
    assert distributed.maybe_initialize() is False


def test_process_info_single_process():
    idx, count = distributed.process_info()
    assert (idx, count) == (0, 1)


def test_env_contract_documented():
    # The variables named in the module docstring are the ones read.
    src = open(distributed.__file__).read()
    for var in ("VAT_COORDINATOR", "VAT_NUM_PROCESSES", "VAT_PROCESS_ID"):
        assert var in src
