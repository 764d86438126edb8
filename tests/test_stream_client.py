"""PipelinedStream ordering/progress tests with a fake device backend.

The client wraps the compiled step with overlapped uploads (reference hot
loop is strictly synchronous, /root/reference/live2diff/pipeline_stream_animation_depth.py:625-660);
these tests pin the concurrency contract: frames are dispatched in input
order regardless of upload completion order, nothing is dropped, and the
state threading is sequential.
"""

import random
import threading
import time

import numpy as np
import pytest

from live2diff_tpu.stream.client import PipelinedStream

pytestmark = pytest.mark.fast


class _FakeJax:
    @staticmethod
    def device_put(x):
        time.sleep(random.uniform(0.0, 0.003))  # jittered "transfer"
        return x

    @staticmethod
    def block_until_ready(x):
        return x


class _FakeStream:
    def __call__(self, state, frame):
        return state + 1, frame * 2


def _run(upload_threads: int, max_in_flight: int, n: int = 120):
    ps = PipelinedStream(
        _FakeStream(), 0, max_in_flight=max_in_flight, upload_threads=upload_threads
    )
    ps._jax = _FakeJax()
    frames = [np.full((3,), i) for i in range(n)]
    outs = list(ps.map(frames))
    assert len(outs) == n
    assert [int(o[0]) for o in outs] == [2 * i for i in range(n)]
    assert ps.state == n


def test_single_uploader_ordered():
    _run(upload_threads=1, max_in_flight=2)


def test_parallel_uploaders_preserve_order():
    random.seed(0)
    _run(upload_threads=4, max_in_flight=3)


def test_parallel_uploaders_small_stream():
    random.seed(1)
    _run(upload_threads=3, max_in_flight=2, n=2)


def test_empty_stream():
    ps = PipelinedStream(_FakeStream(), 0, upload_threads=3)
    ps._jax = _FakeJax()
    assert list(ps.map([])) == []


def _no_leaked_threads(before, timeout=5.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        extra = set(threading.enumerate()) - before
        if not extra:
            return True
        time.sleep(0.01)
    return False


def test_upload_failure_joins_threads():
    """A failed upload raises to the consumer AND tears down the feeder and
    uploader threads (no daemon threads left blocked on the queue/cv)."""

    class _FailJax:
        @staticmethod
        def device_put(x):
            if int(x[0]) == 5:
                raise RuntimeError("transport down")
            return x

        @staticmethod
        def block_until_ready(x):
            return x

    before = set(threading.enumerate())
    ps = PipelinedStream(_FakeStream(), 0, max_in_flight=2, upload_threads=3)
    ps._jax = _FailJax()
    frames = [np.full((3,), i) for i in range(200)]
    with pytest.raises(RuntimeError, match="transport down"):
        list(ps.map(frames))
    assert _no_leaked_threads(before), "feeder/uploader threads leaked"


def test_abandoned_generator_joins_threads():
    """Dropping the generator early (GeneratorExit) must not leak threads."""
    before = set(threading.enumerate())
    ps = PipelinedStream(_FakeStream(), 0, max_in_flight=2, upload_threads=3)
    ps._jax = _FakeJax()
    frames = [np.full((3,), i) for i in range(200)]
    gen = ps.map(frames)
    for _ in range(4):
        next(gen)
    gen.close()
    assert _no_leaked_threads(before), "threads leaked after generator close"


def test_batched_upload_ordered():
    class _BatchFakeJax:
        @staticmethod
        def device_put(x):
            return x

        @staticmethod
        def block_until_ready(x):
            return x

    for n in (0, 1, 2, 7, 12):
        ps = PipelinedStream(_FakeStream(), 0, max_in_flight=2, upload_batch=3)
        ps._jax = _BatchFakeJax()
        frames = [np.full((3,), i) for i in range(n)]
        outs = list(ps.map(frames))
        assert [int(o[0]) for o in outs] == [2 * i for i in range(n)]
