"""Multi-host (multi-process) scale-out — a thin, optional layer.

Single-slice multi-chip parallelism needs nothing from this module: a Mesh
over `jax.devices()` shards over ICI (parallel/mesh.py). Crossing hosts
(multi-slice / DCN) in JAX is one extra step — `jax.distributed.initialize`
before any backend use — after which `jax.devices()` spans every process and
the SAME mesh/sharding code works unchanged (SURVEY.md §2.4: the comm layer
is a config change, not a rewrite).

The reference has no distributed capability of any kind (SURVEY.md §2.4);
this module is new capability. Besides initialisation it owns the DATA half
of the multi-process contract: per-process loader slicing + global-array
assembly (local_loader_params / globalize_batch below), consumed by
scripts/train_model.py.

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


# -- per-process data sharding -----------------------------------------------------
#
# Multi-process training needs the DATA path sharded too: each process loads
# only its slice of the global batch and the slices are assembled into global
# jax.Arrays (ADVICE r2: without this, every process would feed a full
# host-local batch to a mesh spanning global devices). Contract used by
# scripts/train_model.py:
#   local_bs, local_seed = local_loader_params(global_batch, seed)
#   loader = BatchLoader(ds, batch_size=local_bs, seed=local_seed, ...)
#   for batch in loader.epoch(): step(state, globalize_batch(batch, mesh))


def local_loader_params(global_batch_size: int, seed: int = 0
                        ) -> tuple[int, int]:
    """(local_batch_size, local_seed) for this process's data loader.

    Each process draws an independent seeded sample stream (disjoint seeds,
    sampling with replacement across processes — standard for SGD); together
    the local batches form the global batch.
    """
    _, pcount = process_info()
    pidx, _ = process_info()
    if global_batch_size % pcount:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"process_count {pcount}")
    return global_batch_size // pcount, seed + 1000003 * pidx


def globalize_batch(batch: dict, mesh, axis: str = "dp") -> dict:
    """Assemble per-process local numpy batches into global jax.Arrays
    sharded over the mesh's data axis (no cross-host copies: each device
    gets the rows its own process loaded)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    out = {}
    for k, v in batch.items():
        spec = P(axis, *([None] * (v.ndim - 1)))
        out[k] = jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), v)
    return out
