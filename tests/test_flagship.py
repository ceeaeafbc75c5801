"""Deployed-model record (models/flagship.py).

The reference deploys exactly one run — its driver hardcodes the train11
best.pt (reference main.py:43). This repo's equivalent is the FLAGSHIP.json
record every serving surface reads; these tests pin its contract: defaults
when absent/corrupt, merge semantics, atomic publish, and the CLI driver's
resolution order (explicit --weights > explicit --arch > flagship).
"""

from __future__ import annotations

import json
import types

import pytest

from vision_assist_tpu.models import flagship as fm


@pytest.fixture
def tmp_record(tmp_path, monkeypatch):
    p = tmp_path / "FLAGSHIP.json"
    monkeypatch.setattr(fm, "FLAGSHIP_PATH", p)
    return p


class TestRecord:
    def test_defaults_when_absent(self, tmp_record):
        rec = fm.flagship()
        assert rec["asset"] == "v8n_640_best.msgpack"
        assert rec["arch"] == "yolov8n-seg"
        assert rec["imgsz"] == 640

    def test_file_overrides_merge_under_defaults(self, tmp_record):
        tmp_record.write_text(json.dumps(
            {"asset": "x.msgpack", "arch": "yolo11n-seg", "imgsz": 256,
             "map50_mask": 0.78}))
        rec = fm.flagship()
        assert (rec["asset"], rec["arch"], rec["imgsz"]) == (
            "x.msgpack", "yolo11n-seg", 256)
        assert rec["map50_mask"] == 0.78

    def test_corrupt_file_falls_back_to_defaults(self, tmp_record):
        tmp_record.write_text("{not json")
        assert fm.flagship()["arch"] == "yolov8n-seg"

    def test_write_flagship_atomic_publish(self, tmp_record):
        rec = fm.write_flagship("y.msgpack", "yolo11n-seg", 256,
                                map50_mask=0.8, train_split="train+test")
        on_disk = json.loads(tmp_record.read_text())
        assert on_disk["asset"] == "y.msgpack"
        assert on_disk["train_split"] == "train+test"
        assert "switched_at" in on_disk and rec["map50_mask"] == 0.8
        assert not tmp_record.with_suffix(".json.tmp").exists()

    def test_model_config_follows_record_with_overrides(self, tmp_record):
        tmp_record.write_text(json.dumps(
            {"asset": "y.msgpack", "arch": "yolo11n-seg", "imgsz": 256}))
        cfg = fm.model_config()
        assert (cfg.arch, cfg.imgsz) == ("yolo11n-seg", 256)
        assert fm.model_config(imgsz=320).imgsz == 320

    def test_weights_path_none_when_asset_missing(self, tmp_record):
        tmp_record.write_text(json.dumps(
            {"asset": "does_not_exist.msgpack", "arch": "yolo11n-seg",
             "imgsz": 256}))
        assert fm.weights_path() is None
        assert fm.load_flagship_variables() is None


class TestCliResolution:
    """main._resolve_model: --weights > --arch > flagship record."""

    def _args(self, weights=None, arch=None):
        return types.SimpleNamespace(weights=weights, arch=arch)

    def test_default_is_flagship(self):
        from vision_assist_tpu.main import _resolve_model
        cfg, variables = _resolve_model(self._args())
        rec = fm.flagship()
        assert (cfg.arch, cfg.imgsz) == (rec["arch"], rec["imgsz"])
        # The committed flagship asset exists, so the driver gets real
        # weights (the reference driver's deployed-best.pt behaviour).
        assert variables is not None or fm.weights_path() is None

    def test_explicit_arch_random_init(self):
        from vision_assist_tpu.main import _resolve_model
        cfg, variables = _resolve_model(self._args(arch="yolov8n-seg"))
        assert cfg.arch == "yolov8n-seg" and variables is None

    def test_explicit_weights_win(self, tmp_path):
        from flax import serialization

        from vision_assist_tpu.main import _resolve_model
        w = tmp_path / "w.msgpack"
        w.write_bytes(serialization.msgpack_serialize({"params": {}}))
        cfg, variables = _resolve_model(self._args(weights=str(w)))
        assert cfg.arch == "yolov8n-seg"
        assert isinstance(variables, dict)
