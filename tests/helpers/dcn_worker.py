"""Worker for the real two-process DCN test (tests/test_distributed.py).

Spawned twice by the test with VAT_* env set (coordinator on localhost, CPU
backend, 4 virtual devices per process -> 8 global). Runs the actual
multi-process contract from parallel/distributed.py: maybe_initialize ->
local_loader_params -> globalize_batch -> one sharded train step over the
global dp mesh, then prints one JSON line with the losses so the parent can
assert equality with a single-process run of the same step.
"""

from __future__ import annotations

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[2]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

GLOBAL_BS, DIM, LR, SEED = 16, 8, 0.1, 7


def make_rows(indices):
    """Deterministic global batch: row i is a pure function of i, so any
    process layout assembles the identical global batch."""
    import numpy as np

    x = np.stack([np.sin(0.1 * (i + 1) * np.arange(1, DIM + 1))
                  for i in indices]).astype(np.float32)
    y = (0.5 * x.sum(axis=1, keepdims=True)).astype(np.float32)
    return x, y


def train_step(mesh, batch):
    """One dp-sharded step on a linear model; returns (loss0, loss1, w_sum)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    w0 = jax.device_put(jnp.ones((DIM, 1), jnp.float32),
                        NamedSharding(mesh, P()))

    @jax.jit
    def step(w, x, y):
        def loss_fn(w):
            return jnp.mean((x @ w - y) ** 2)

        loss, grad = jax.value_and_grad(loss_fn)(w)
        w1 = w - LR * grad
        return loss, loss_fn(w1), w1

    loss0, loss1, w1 = step(w0, batch["x"], batch["y"])
    return float(loss0), float(loss1), float(jnp.sum(w1))


def main() -> None:
    from vision_assist_tpu.parallel import distributed

    assert distributed.maybe_initialize(), "VAT_COORDINATOR env missing"
    import jax
    import numpy as np
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()), ("dp",))
    local_bs, _ = distributed.local_loader_params(GLOBAL_BS, seed=SEED)
    pidx, pcount = distributed.process_info()
    x, y = make_rows(range(pidx * local_bs, (pidx + 1) * local_bs))
    batch = distributed.globalize_batch({"x": x, "y": y}, mesh)
    loss0, loss1, w_sum = train_step(mesh, batch)
    print(json.dumps({
        "rank": pidx, "pcount": pcount, "ndev": len(jax.devices()),
        "local_ndev": len(jax.local_devices()), "local_bs": local_bs,
        "loss0": loss0, "loss1": loss1, "w_sum": w_sum,
    }), flush=True)


if __name__ == "__main__":
    main()
