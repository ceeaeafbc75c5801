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
    path.write_bytes(serialization.msgpack_serialize(
        serialization.to_state_dict(variables)))


def load_variables(path: str | pathlib.Path) -> Any:
    return serialization.msgpack_restore(pathlib.Path(path).read_bytes())
