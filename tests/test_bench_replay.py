"""Bench outage-replay bounds (VERDICT r4 #5, ADVICE r4 medium).

The scoreboard replays a staged chip-quiet measurement during a relay
outage ONLY when it is recent and the benched code is byte-identical to
measurement time; otherwise it refuses with an explicit error record.
These tests drive `bench.outage_record` (the pure decision function)
through every path: valid replay, missing record, undatable record,
too-stale record, and code-fingerprint drift.
"""

import calendar
import time

import bench

OUTAGE = "TPU relay tunnel down (test)"
FP = "aabbccddeeff0011"


def _staged(measured_at="2026-08-17T13:33:38Z", fingerprint=FP, **over):
    rec = {
        "metric": "frames/sec/chip end-to-end (seg+pathfind) at 640x640",
        "value": 81.25, "unit": "fps", "vs_baseline": 19.5,
        "chip_quiet": True, "measured_at": measured_at,
        "code_fingerprint": fingerprint,
    }
    rec.update(over)
    return rec


def _epoch(stamp):
    return calendar.timegm(time.strptime(stamp, "%Y-%m-%dT%H:%M:%SZ"))


class TestValidReplay:
    def test_replays_within_bounds(self):
        staged = _staged()
        now = _epoch(staged["measured_at"]) + 3600
        out = bench.outage_record(staged, OUTAGE, now, FP)
        assert out["value"] == 81.25
        assert out["stale"] is True
        assert "staleness_note" in out

    def test_metric_string_carries_staleness(self):
        # ADVICE r4 medium: a consumer that reads only `metric`/`value`
        # must still see the staleness — it is in the metric string itself.
        staged = _staged()
        now = _epoch(staged["measured_at"]) + 3600
        out = bench.outage_record(staged, OUTAGE, now, FP)
        assert "STALE replay of 2026-08-17T13:33:38Z" in out["metric"]

    def test_staged_record_on_disk_not_mutated(self):
        staged = _staged()
        out = bench.outage_record(staged, OUTAGE,
                                  _epoch(staged["measured_at"]) + 60, FP)
        assert "stale" not in staged  # replay works on a copy
        assert out is not staged

    def test_pre_fingerprint_record_grandfathered_with_note(self):
        # Records staged before fingerprinting existed carry no
        # fingerprint; they replay (within age) but flag the unknown drift.
        staged = _staged(fingerprint=None)
        del staged["code_fingerprint"]
        now = _epoch(staged["measured_at"]) + 3600
        out = bench.outage_record(staged, OUTAGE, now, FP)
        assert out["value"] == 81.25
        assert "fingerprint_note" in out


class TestRefusals:
    def test_no_staged_record(self):
        out = bench.outage_record({}, OUTAGE, 0.0, FP)
        assert out["value"] == 0.0
        assert "no staged chip-quiet measurement" in out["error"]
        assert "stale_value" not in out

    def test_non_chip_quiet_record_refused(self):
        staged = _staged(chip_quiet=False)
        out = bench.outage_record(staged, OUTAGE,
                                  _epoch(staged["measured_at"]), FP)
        assert out["value"] == 0.0

    def test_undatable_record_refused(self):
        staged = _staged()
        del staged["measured_at"]
        out = bench.outage_record(staged, OUTAGE, 0.0, FP)
        assert out["value"] == 0.0
        assert "measured_at" in out["error"]
        assert out["stale_value"] == 81.25

    def test_too_stale_refused(self):
        staged = _staged()
        now = _epoch(staged["measured_at"]) + bench.MAX_REPLAY_AGE_S + 1
        out = bench.outage_record(staged, OUTAGE, now, FP)
        assert out["value"] == 0.0
        assert "max replay age" in out["error"]
        assert out["stale_value"] == 81.25
        assert out["stale_measured_at"] == staged["measured_at"]

    def test_fingerprint_drift_refused(self):
        staged = _staged()
        now = _epoch(staged["measured_at"]) + 3600
        out = bench.outage_record(staged, OUTAGE, now, "0123456789abcdef")
        assert out["value"] == 0.0
        assert "fingerprint" in out["error"]
        assert out["stale_value"] == 81.25

    def test_boundary_age_still_replays(self):
        staged = _staged()
        now = _epoch(staged["measured_at"]) + bench.MAX_REPLAY_AGE_S
        out = bench.outage_record(staged, OUTAGE, now, FP)
        assert out["value"] == 81.25


class TestFingerprint:
    def test_deterministic_and_hex(self):
        a = bench.code_fingerprint()
        b = bench.code_fingerprint()
        assert a == b
        assert len(a) == 16
        int(a, 16)  # hex-parseable

    def test_covers_pipeline_sources(self):
        # The fingerprint must react to benched-path edits: hash the tree
        # with one pipeline file's bytes perturbed via a monkeypatched
        # read and confirm the digest changes.
        import pathlib

        real_read = pathlib.Path.read_bytes
        target = (bench.REPO / "vision_assist_tpu" / "pipeline"
                  / "frame_processor.py")

        def fake_read(self):
            data = real_read(self)
            return data + b"# drift" if self == target else data

        baseline = bench.code_fingerprint()
        pathlib.Path.read_bytes = fake_read
        try:
            drifted = bench.code_fingerprint()
        finally:
            pathlib.Path.read_bytes = real_read
        assert drifted != baseline
