"""Device mesh and sharding specs.

The reference has no distributed capability at all (SURVEY.md §2.4); this
module introduces it the TPU way: one small topology-agnostic surface that the
rest of the framework consumes, so scaling is a config change.

Axes:
  dp   — data parallel: batch/stream axis (camera streams in serving,
         images in training). Collectives (grad psum) ride ICI.
  mdl  — model/tensor parallel: wide channel dimensions of conv kernels and
         the proto/coefficient einsum. YOLO-nano rarely needs it; the axis
         exists so bigger family members and future models shard without a
         rewrite, and so multi-chip compilation is exercised in CI.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, mdl: int = 1,
              devices=None) -> Mesh:
    """Mesh of shape (dp, mdl) over the first n_devices devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if n_devices % mdl:
        raise ValueError(f"n_devices={n_devices} not divisible by mdl={mdl}")
    grid = np.asarray(devices).reshape(n_devices // mdl, mdl)
    return Mesh(grid, ("dp", "mdl"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis over dp, everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_partition_spec(path: tuple, value: Any, mdl_size: int) -> P:
    """Sharding rule for model parameters.

    Conv kernels (H, W, Cin, Cout) shard Cout over 'mdl' when divisible; BN
    and biases replicate. With mdl=1 everything replicates (pure DP).
    """
    if mdl_size <= 1 or not hasattr(value, "ndim"):
        return P()
    if value.ndim == 4 and value.shape[-1] % mdl_size == 0 \
            and value.shape[-1] >= 2 * mdl_size:
        return P(None, None, None, "mdl")
    return P()


def shard_params(params, mesh: Mesh):
    """Apply param_partition_spec across a params pytree."""
    mdl_size = mesh.shape["mdl"]

    def place(path, x):
        spec = param_partition_spec(path, x, mdl_size)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch, mesh: Mesh):
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def proto_einsum_specs() -> tuple[P, P]:
    """Activation shardings for the mask-assembly einsum
    (models/decode.py::assemble_masks — coeffs (D, nm) x protos (H, W, nm)).

    The contraction axis nm (the prototype channel) shards over 'mdl': each
    device holds nm/mdl prototypes and its slice of every coefficient vector,
    computes a partial (D, H, W) mask, and XLA inserts ONE psum over mdl.
    This is the tensor-parallel consumer for the mdl axis beyond weight
    sharding — exercised at mdl=2 with an equality assertion in
    tests/test_distributed.py.
    """
    return P(None, "mdl"), P(None, None, "mdl")
