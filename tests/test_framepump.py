"""Native serving runtime tests (built on the fly with g++; skipped if absent)."""

import threading
import time

import numpy as np
import pytest

from live2diff_tpu.serve import framepump

pytestmark = [
    pytest.mark.fast,
    pytest.mark.skipif(
        not framepump.available(), reason="native toolchain/libjpeg unavailable"
    ),
]


def test_jpeg_roundtrip():
    rng = np.random.RandomState(0)
    # smooth image so JPEG loss is small
    x = np.linspace(0, 255, 64, dtype=np.uint8)
    img = np.stack(np.broadcast_arrays(x[None, :], x[:, None], x[None, :]), axis=-1)
    img = np.ascontiguousarray(img.astype(np.uint8))
    data = framepump.encode_jpeg(img, quality=95)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    back = framepump.decode_jpeg(data)
    assert back.shape == img.shape
    assert np.abs(back.astype(int) - img.astype(int)).mean() < 5


def test_jpeg_interop_with_pil():
    import io

    from PIL import Image

    img = np.zeros((32, 48, 3), np.uint8)
    img[:, :, 2] = 200
    data = framepump.encode_jpeg(img)
    pil = np.asarray(Image.open(io.BytesIO(data)))
    assert pil.shape == (32, 48, 3)
    assert abs(int(pil[:, :, 2].mean()) - 200) < 6


def test_frame_ring_drop_oldest_and_blocking():
    ring = framepump.FrameRing(capacity=2)
    assert ring.pop(timeout_ms=30) is None  # empty -> timeout
    ring.push(b"a")
    ring.push(b"b")
    ring.push(b"c")  # drops "a"
    assert ring.dropped == 1
    assert ring.pop() == b"b"
    assert ring.pop() == b"c"
    assert len(ring) == 0

    # blocking pop woken by a producer thread
    result = []

    def consumer():
        result.append(ring.pop(timeout_ms=2000))

    t = threading.Thread(target=consumer)
    t.start()
    time.sleep(0.05)
    ring.push(b"late")
    t.join(timeout=3)
    assert result == [b"late"]
