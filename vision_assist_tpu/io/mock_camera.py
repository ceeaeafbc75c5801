"""MockCamera: video-file-backed camera with frame-rate pacing.

API-compatible twin of the reference MockCamera (MockCamera.py:5-74), which
mirrors cv2.VideoCapture: read()/get()/isOpened()/release(), sleeping between
reads to enforce a target FPS.
"""

from __future__ import annotations

import pathlib
import time


class MockCamera:
    def __init__(self, video_path: str | pathlib.Path,
                 target_fps: float | None = None):
        import cv2

        self._cv2 = cv2
        self.cap = cv2.VideoCapture(str(video_path))
        if not self.cap.isOpened():
            raise ValueError(f"Failed to open video file: {video_path}")
        self.original_fps = self.cap.get(cv2.CAP_PROP_FPS)
        self.target_fps = target_fps if target_fps is not None else self.original_fps
        self.frame_delay = 1.0 / self.target_fps if self.target_fps else 0.0
        self.last_frame_time = 0.0
        self.frame_width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.frame_height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.frame_count = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))

    def read(self):
        elapsed = time.time() - self.last_frame_time
        if elapsed < self.frame_delay:
            time.sleep(self.frame_delay - elapsed)
        ret, frame = self.cap.read()
        self.last_frame_time = time.time()
        return ret, frame

    def get(self, prop_id):
        return self.cap.get(prop_id)

    def isOpened(self):  # noqa: N802 - cv2 API compatibility
        return self.cap.isOpened()

    def release(self):
        self.cap.release()
