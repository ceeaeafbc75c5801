"""Multi-host (multi-process) scale-out — a thin, optional layer.

Single-slice multi-chip parallelism needs nothing from this module: a Mesh
over `jax.devices()` shards over ICI (parallel/mesh.py). Crossing hosts
(multi-slice / DCN) in JAX is one extra step — `jax.distributed.initialize`
before any backend use — after which `jax.devices()` spans every process and
the SAME mesh/sharding code works unchanged (SURVEY.md §2.4: the comm layer
is a config change, not a rewrite).

The reference has no distributed capability of any kind (SURVEY.md §2.4);
this module is new capability.

Environment contract (standard JAX multi-process variables):
  VAT_COORDINATOR       coordinator address host:port (enables the layer)
  VAT_NUM_PROCESSES     total process count
  VAT_PROCESS_ID        this process's rank
On TPU pods, `jax.distributed.initialize()` autodetects all three; setting
just VAT_COORDINATOR=auto requests that autodetection path.
"""

from __future__ import annotations

import os

_initialized = False


def maybe_initialize() -> bool:
    """Initialise multi-process JAX when the environment asks for it.

    Returns True when running multi-process (after initialisation), False
    for the ordinary single-process case. Idempotent. Must be called before
    the first jax backend touch to have any effect.
    """
    global _initialized
    coord = os.environ.get("VAT_COORDINATOR")
    if not coord:
        return False
    import jax

    if _initialized:
        return True
    if coord == "auto":
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["VAT_NUM_PROCESSES"]),
            process_id=int(os.environ["VAT_PROCESS_ID"]))
    _initialized = True
    return True


def process_info() -> tuple[int, int]:
    """(process_index, process_count) — (0, 1) when single-process."""
    import jax

    return jax.process_index(), jax.process_count()
