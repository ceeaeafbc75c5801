"""StreamingServer: pipelined results must equal the sync loop, in order."""

import numpy as np

from vision_assist_tpu.config import ModelConfig, PipelineConfig
from vision_assist_tpu.models.inference import Segmenter
from vision_assist_tpu.pipeline.frame_processor import FrameProcessor
from vision_assist_tpu.pipeline.server import StreamingServer


def _setup(transfer_format="bgr"):
    cfg = PipelineConfig(frame_height=320, frame_width=240,
                         model=ModelConfig(imgsz=64),
                         transfer_format=transfer_format)
    seg = Segmenter(cfg.model, example_hw=(320, 240),
                    grid_size=cfg.grid.grid_size)
    return cfg, seg


def _frames(n):
    return np.random.default_rng(7).integers(
        0, 255, (n, 320, 240, 3), dtype=np.uint8)


class TestStreamingServer:
    def test_matches_sync_loop(self):
        cfg, seg = _setup()
        frames = _frames(9)

        sync = FrameProcessor(cfg, segmenter=seg)
        expected = [sync(f, now_ms=i * 33).final_answer
                    for i, f in enumerate(frames)]

        srv = StreamingServer(FrameProcessor(cfg, segmenter=seg), depth=3)
        got = [r.final_answer
               for r in srv.serve(frames, now_ms_start=0,
                                  frame_interval_ms=33)]
        assert got == expected
        assert srv.in_flight == 0

    def test_i420_transfer(self):
        cfg, seg = _setup("i420")
        frames = _frames(5)
        srv = StreamingServer(FrameProcessor(cfg, segmenter=seg), depth=2)
        results = list(srv.serve(frames))
        assert len(results) == 5
        for r in results:
            assert r.final_answer in (
                "move_left", "move_right", "continue_forward")

    def test_depth_validation(self):
        import pytest
        cfg, seg = _setup()
        with pytest.raises(ValueError):
            StreamingServer(FrameProcessor(cfg, segmenter=seg), depth=0)

    def test_keep_frames_passes_frame_to_retire(self):
        """keep_frames=True must hand the original frame to retire_frame
        so --debug overlays render on the camera frame, not black."""
        cfg, seg = _setup()
        fp = FrameProcessor(cfg, segmenter=seg)
        seen = []
        orig = fp.retire_frame

        def spy(handle, now_ms=None, frame=None):
            seen.append(frame is not None)
            return orig(handle, now_ms=now_ms, frame=frame)

        fp.retire_frame = spy
        srv = StreamingServer(fp, depth=2, keep_frames=True)
        results = list(srv.serve(_frames(3)))
        assert len(results) == 3
        assert seen == [True, True, True]


class TestBatchedStreamingServer:
    def test_matches_sync_steps(self):
        from vision_assist_tpu.pipeline.multi_stream import (
            MultiStreamProcessor,
        )
        from vision_assist_tpu.pipeline.server import BatchedStreamingServer

        cfg, seg = _setup()
        cfg = cfg.replace(num_streams=2)
        steps = [_frames(2) for _ in range(4)]

        sync = MultiStreamProcessor(cfg, segmenter=seg)
        expected = [[r.final_answer
                     for r in sync.process_frames(s, now_ms=i * 33)]
                    for i, s in enumerate(steps)]
        sync.close()

        srv = BatchedStreamingServer(
            MultiStreamProcessor(cfg, segmenter=seg), depth=2)
        got = []
        for i, s in enumerate(steps):
            got.extend([[r.final_answer for r in step]
                        for step in srv.feed(s, now_ms=i * 33)])
        got.extend([[r.final_answer for r in step]
                    for step in srv.drain()])
        srv.msp.close()
        assert got == expected
        assert srv.in_flight == 0
