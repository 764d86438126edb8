"""Similar-image filter: probabilistically skip near-duplicate frames.

Behavioural parity with the reference's ``SimilarImageFilter``
(/root/reference/live2diff/image_filter.py:7-45): cosine similarity between
consecutive frames; above the threshold, skip with probability
(sim - threshold) / (1 - threshold), hard-capped at ``max_skip_frame``
consecutive skips. Host-side numpy — this runs before device dispatch.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class SimilarImageFilter:
    def __init__(self, threshold: float = 0.98, max_skip_frame: int = 10):
        self.threshold = threshold
        self.max_skip_frame = max_skip_frame
        self.prev_frame: Optional[np.ndarray] = None
        self.skip_count = 0
        self._rng = np.random.RandomState(0)

    def set_threshold(self, threshold: float) -> None:
        self.threshold = threshold

    def set_max_skip_frame(self, max_skip_frame: int) -> None:
        self.max_skip_frame = max_skip_frame

    def __call__(self, frame: np.ndarray) -> Optional[np.ndarray]:
        """Returns the frame to process, or None to skip (replay previous output)."""
        x = np.asarray(frame, dtype=np.float32).ravel()
        if self.prev_frame is None:
            self.prev_frame = x
            return frame
        denom = np.linalg.norm(x) * np.linalg.norm(self.prev_frame)
        sim = float(x @ self.prev_frame / denom) if denom > 0 else 1.0
        if sim >= self.threshold and self.skip_count < self.max_skip_frame:
            skip_prob = (sim - self.threshold) / (1.0 - self.threshold)
            if self._rng.uniform() < skip_prob:
                self.skip_count += 1
                return None
        self.prev_frame = x
        self.skip_count = 0
        return frame
