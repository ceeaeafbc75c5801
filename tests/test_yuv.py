"""I420 transfer-format tests: device conversion bit-matches cv2, and the
fused pipeline in transfer_format="i420" equals the BGR pipeline fed the
same chroma-subsampled frame.

The serving paths stream YUV 4:2:0 (the camera-native format) to the device
at 2.13x fewer bytes than BGR — ops/yuv.py. Reference ingest counterpart:
MockCamera.py:21-38 (cv2.VideoCapture frames, themselves decoded from 4:2:0
sources).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vision_assist_tpu.config import ModelConfig, PipelineConfig
from vision_assist_tpu.ops.yuv import bgr_to_i420_host, i420_shape, i420_to_bgr


def _frames(n, h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (n, h, w, 3), dtype=np.uint8)


class TestI420Conversion:
    def test_matches_cv2_exactly(self):
        # (70, 48) and (270, 96): h % 4 == 2, where the U/V runs do not
        # fall on whole rows of the packed plane (regression: row-sliced
        # unpack crashed on these).
        for seed, (h, w) in enumerate([(64, 48), (128, 96), (60, 100),
                                       (70, 48), (270, 96)]):
            frame = _frames(1, h, w, seed)[0]
            plane = bgr_to_i420_host(frame)
            assert plane.shape == i420_shape(h, w)
            ours = np.asarray(i420_to_bgr(plane, h, w))
            ref = cv2.cvtColor(plane, cv2.COLOR_YUV2BGR_I420)
            np.testing.assert_array_equal(ours, ref)

    def test_roundtrip_close_to_original(self):
        # Smooth natural-ish content: chroma subsampling loses ~nothing.
        h = w = 64
        yy, xx = np.mgrid[0:h, 0:w]
        frame = np.stack([(yy * 2) % 256, (xx * 2) % 256,
                          ((yy + xx)) % 256], axis=-1).astype(np.uint8)
        back = np.asarray(i420_to_bgr(bgr_to_i420_host(frame), h, w))
        assert np.abs(back.astype(int) - frame.astype(int)).mean() < 3.0

    def test_odd_dims_rejected(self):
        with pytest.raises(ValueError):
            i420_shape(63, 64)


class TestI420Pipeline:
    def test_fused_equals_bgr_pipeline_on_subsampled_frame(self):
        """fp_i420(frame) must equal fp_bgr(cv2-roundtripped frame) bit-for-
        bit: the only difference between the two paths is WHERE the (exact
        same) conversion runs."""
        from vision_assist_tpu.models.inference import Segmenter
        from vision_assist_tpu.pipeline.frame_processor import FrameProcessor

        base = PipelineConfig(frame_height=320, frame_width=240,
                              model=ModelConfig(imgsz=64))
        seg = Segmenter(base.model, example_hw=(320, 240),
                        grid_size=base.grid.grid_size)
        frame = _frames(1, 320, 240, seed=3)[0]

        fp_i420 = FrameProcessor(base.replace(transfer_format="i420"),
                                 segmenter=seg)
        r_i420 = fp_i420(frame, now_ms=0)

        roundtripped = cv2.cvtColor(bgr_to_i420_host(frame),
                                    cv2.COLOR_YUV2BGR_I420)
        fp_bgr = FrameProcessor(base, segmenter=seg)
        r_bgr = fp_bgr(roundtripped, now_ms=0)

        assert r_i420.final_answer == r_bgr.final_answer
        np.testing.assert_array_equal(r_i420.walkable, r_bgr.walkable)
        np.testing.assert_array_equal(r_i420.occupancy, r_bgr.occupancy)
        assert r_i420.n_detections == r_bgr.n_detections

    def test_i420_requires_host_frame(self):
        import jax.numpy as jnp

        from vision_assist_tpu.models.inference import Segmenter
        from vision_assist_tpu.pipeline.frame_processor import FrameProcessor

        cfg = PipelineConfig(frame_height=320, frame_width=240,
                             model=ModelConfig(imgsz=64),
                             transfer_format="i420")
        seg = Segmenter(cfg.model, example_hw=(320, 240),
                        grid_size=cfg.grid.grid_size)
        fp = FrameProcessor(cfg, segmenter=seg)
        with pytest.raises(ValueError, match="i420"):
            fp.submit_frame(jnp.zeros((320, 240, 3), jnp.uint8))

    def test_multi_stream_i420_equals_bgr(self):
        from vision_assist_tpu.models.inference import Segmenter
        from vision_assist_tpu.pipeline.multi_stream import (
            MultiStreamProcessor,
        )

        cfg = PipelineConfig(frame_height=320, frame_width=240,
                             model=ModelConfig(imgsz=64), num_streams=2)
        seg = Segmenter(cfg.model, example_hw=(320, 240),
                        grid_size=cfg.grid.grid_size)
        frames = _frames(2, 320, 240, seed=5)
        msp_i = MultiStreamProcessor(cfg.replace(transfer_format="i420"),
                                     segmenter=seg)
        res_i = msp_i.process_frames(frames, now_ms=0)
        msp_i.close()

        rt = np.stack([cv2.cvtColor(bgr_to_i420_host(f),
                                    cv2.COLOR_YUV2BGR_I420) for f in frames])
        msp_b = MultiStreamProcessor(cfg, segmenter=seg)
        res_b = msp_b.process_frames(rt, now_ms=0)
        msp_b.close()
        for a, b in zip(res_i, res_b):
            assert a.final_answer == b.final_answer
            np.testing.assert_array_equal(a.walkable, b.walkable)
