"""Model checkpointing.

The reference's only checkpointing is ultralytics' best.pt/SavedModel artifacts
(SURVEY.md §5 "Checkpoint / resume"). Here: msgpack via flax.serialization for
single-file variables, plus orbax for training-state checkpoints (optimizer +
step) used by models/train.py.
"""

from __future__ import annotations

import pathlib
from typing import Any

from flax import serialization


def save_variables(path: str | pathlib.Path, variables: Any) -> None:
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # Atomic write (tmp + rename): concurrent readers (e.g. the checkpoint
    # snapshot committer) must never observe a torn file.
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(serialization.msgpack_serialize(
        serialization.to_state_dict(variables)))
    tmp.replace(path)


def load_variables(path: str | pathlib.Path) -> Any:
    return serialization.msgpack_restore(pathlib.Path(path).read_bytes())


# -- full training-state checkpoints (orbax) ---------------------------------------


def save_train_state(path: str | pathlib.Path, state) -> None:
    """Checkpoint the complete TrainState (params, EMA, optimizer, step) so a
    run can RESUME exactly — capability twin of ultralytics' resume=True
    (model/runs/segment/train16/args.yaml:27)."""
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).absolute()
    tree = {
        "step": state.step,
        "params": serialization.to_state_dict(state.params),
        "batch_stats": serialization.to_state_dict(state.batch_stats),
        "ema_params": serialization.to_state_dict(state.ema_params),
        "opt_state": serialization.to_state_dict(state.opt_state),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def load_train_state(path: str | pathlib.Path, state):
    """Restore a TrainState checkpoint into a freshly-created state template."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(pathlib.Path(path).absolute())
    return state.replace(
        step=tree["step"],
        params=serialization.from_state_dict(state.params, tree["params"]),
        batch_stats=serialization.from_state_dict(state.batch_stats,
                                                  tree["batch_stats"]),
        ema_params=serialization.from_state_dict(state.ema_params,
                                                 tree["ema_params"]),
        opt_state=serialization.from_state_dict(state.opt_state,
                                                tree["opt_state"]),
    )
