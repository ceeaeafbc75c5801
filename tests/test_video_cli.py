"""Integration test: MockCamera + the video CLI on a synthetic clip (small
frames so CPU compile stays cheap)."""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    """A 320x240 clip with a bright trapezoid 'path' sliding sideways."""
    path = tmp_path_factory.mktemp("video") / "clip.mp4"
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30,
                        (240, 320))
    assert w.isOpened()
    for t in range(60):
        frame = np.full((320, 240, 3), 30, np.uint8)
        shift = int(10 * np.sin(t / 10))
        pts = np.array([[80 + shift, 310], [160 + shift, 310],
                        [140 + shift, 60], [100 + shift, 60]], np.int32)
        cv2.fillPoly(frame, [pts], (180, 180, 180))
        w.write(frame)
    w.release()
    return path


class TestMockCamera:
    def test_api(self, clip):
        from vision_assist_tpu.io.mock_camera import MockCamera

        cam = MockCamera(clip, target_fps=1000)
        assert cam.isOpened()
        assert (cam.frame_width, cam.frame_height) == (240, 320)
        assert cam.frame_count == 60
        ret, frame = cam.read()
        assert ret and frame.shape == (320, 240, 3)
        assert cam.get(cv2.CAP_PROP_FPS) == 30
        cam.release()

    def test_paces_frame_rate(self, clip):
        import time

        from vision_assist_tpu.io.mock_camera import MockCamera

        cam = MockCamera(clip, target_fps=100)
        t0 = time.time()
        for _ in range(10):
            cam.read()
        assert time.time() - t0 >= 0.08  # ~10 frames at 100 fps
        cam.release()


class TestVideoCLI:
    def test_end_to_end(self, clip, tmp_path, capsys):
        from vision_assist_tpu.main import main

        rc = main([
            "video", "--source", str(clip), "--every-n", "20",
            "--camera-fps", "10000", "--engine", "wavefront",
            "--timing-data-path", str(tmp_path / "timing.txt"),
            "--output", str(tmp_path),
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "processing summary" in out
        assert "frames processed: 3" in out
        assert (tmp_path / "timing.txt").exists()

    def test_pipelined_depth(self, clip, tmp_path, capsys):
        """--depth >1 routes through StreamingServer: same number of
        answers, reported as throughput, in submit order."""
        from vision_assist_tpu.main import main

        rc = main([
            "video", "--source", str(clip), "--every-n", "20",
            "--camera-fps", "10000", "--engine", "wavefront",
            "--depth", "2", "--output", str(tmp_path),
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "processing summary (pipelined)" in out
        assert "frames submitted: 3" in out
        assert "frames answered:  3" in out
        assert "throughput:" in out
