"""Deployed-model ("flagship") selection — one record, many consumers.

The reference deploys exactly one training run: its driver loads the
train11 best.pt (reference main.py:43, model/export.py:5) even though the
repo carries a 9-run arch x imgsz study (model/runs/segment/train*).  This
repo's equivalent of "which run is deployed" is a small metadata record,
``assets/weights/FLAGSHIP.json``, written by the training chains when a
checkpoint is promoted to deployment.  Every serving surface reads it:
``bench.py``, the CLI driver (``vision_assist_tpu.main``), the latency /
detection diagnosers under ``tools/``, and ``__graft_entry__.entry``.

Absent the file (or its asset), the defaults preserve the historical
flagship (yolov8n-seg @ imgsz 640, ``v8n_640_best.msgpack``), so a fresh
checkout behaves exactly as before the record existed.

The record is deliberately tiny and explicit::

    {"asset": "y11n_256_best.msgpack", "arch": "yolo11n-seg", "imgsz": 256,
     "map50_mask": 0.78, "train_split": "train", "switched_at": "..."}

``map50_mask``/``train_split`` are provenance (what full-val score earned
the promotion, and on which training split — the reference baselines are
train-only, so an extra-data flagship must carry the caveat with it).
"""

from __future__ import annotations

import json
import pathlib
import time
from typing import Any

from vision_assist_tpu.config import ModelConfig

REPO = pathlib.Path(__file__).resolve().parents[2]
FLAGSHIP_PATH = REPO / "assets" / "weights" / "FLAGSHIP.json"

_DEFAULT: dict[str, Any] = {
    "asset": "v8n_640_best.msgpack",
    "arch": "yolov8n-seg",
    "imgsz": 640,
}


def flagship() -> dict[str, Any]:
    """The deployed-model record (defaults merged under the file, if any)."""
    rec = dict(_DEFAULT)
    try:
        rec.update(json.loads(FLAGSHIP_PATH.read_text()))
    except (OSError, json.JSONDecodeError):
        pass
    return rec


def weights_path() -> pathlib.Path | None:
    """Absolute path of the flagship checkpoint, or None if not on disk."""
    p = REPO / "assets" / "weights" / flagship()["asset"]
    return p if p.exists() else None


def model_config(**overrides: Any) -> ModelConfig:
    """ModelConfig for the flagship arch/imgsz (kwargs override)."""
    rec = flagship()
    kw: dict[str, Any] = {"arch": rec["arch"], "imgsz": int(rec["imgsz"])}
    kw.update(overrides)
    return ModelConfig(**kw)


def load_flagship_variables():
    """Flagship weights as a Flax variables tree, or None (random init)."""
    p = weights_path()
    if p is None:
        return None
    from vision_assist_tpu.models.checkpoint import load_variables

    return load_variables(p)


def write_flagship(asset: str, arch: str, imgsz: int,
                   **provenance: Any) -> dict[str, Any]:
    """Atomically publish a new deployed-model record (chains call this)."""
    rec: dict[str, Any] = {"asset": asset, "arch": arch, "imgsz": int(imgsz),
                           "switched_at": time.strftime(
                               "%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    rec.update(provenance)
    tmp = FLAGSHIP_PATH.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(rec, indent=1))
    tmp.replace(FLAGSHIP_PATH)
    return rec
