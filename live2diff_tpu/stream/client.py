"""PipelinedStream: overlapped host->TPU streaming around the compiled step.

The reference's hot loop is strictly synchronous — preprocess, upload,
infer, download, repeat (/root/reference/live2diff/pipeline_stream_animation_depth.py:625-660)
— which is fine over PCIe but serialises badly when host<->device transfer
has real latency. This client pipelines the three phases:

  uploader thread:  np frame -> jax.device_put -> bounded queue
  dispatch (caller): device frame -> donated jit step (async dispatch)
  completion:        bounded in-flight window; block only on the oldest
                     result when the window is full

Steady-state throughput = max(upload time, device step time) instead of
their sum (plus round-trip latency). Frames may be uint8 ([0,255]) — 4x
cheaper to move — and are normalised on device inside the compiled step.
"""

from __future__ import annotations

import collections
import queue
import threading
import time
from typing import Iterable, Iterator, Optional

import numpy as np


class _UploadError:
    """Marker carrying an exception from an uploader thread to the consumer."""

    def __init__(self, exc: Exception):
        self.exc = exc


class PipelinedStream:
    """Throughput-oriented wrapper over ``StreamDiffusionDepth``.

    Usage::

        ps = PipelinedStream(stream, state)
        for out in ps.map(frames):   # np arrays, uint8 or float32 in [-1, 1]
            ...

    or incrementally with ``submit(frame)`` / ``drain()``.
    """

    def __init__(
        self,
        stream,
        state,
        max_in_flight: int = 2,
        upload_depth: int = 2,
        upload_threads: int = 1,
        upload_batch: int = 1,
    ):
        import jax

        self._jax = jax
        self.stream = stream
        self.state = state
        self.max_in_flight = max_in_flight
        self.upload_threads = upload_threads
        self.upload_batch = upload_batch
        self._upload_q: queue.Queue = queue.Queue(maxsize=max(upload_depth, upload_threads))
        self._in_flight: collections.deque = collections.deque()
        self._uploader: Optional[threading.Thread] = None
        self.frame_times: list = []
        self._last_emit = None

    # -- incremental API ---------------------------------------------------

    def submit(self, frame: np.ndarray):
        """Dispatch one frame; returns a ready output if the window is full."""
        jax = self._jax
        dev = jax.device_put(frame)
        self.state, out = self.stream(self.state, dev)
        self._in_flight.append(out)
        if len(self._in_flight) > self.max_in_flight:
            return self._pop_ready()
        return None

    def drain(self) -> Iterator[np.ndarray]:
        while self._in_flight:
            yield self._pop_ready()

    def _pop_ready(self):
        out = self._in_flight.popleft()
        self._jax.block_until_ready(out)
        now = time.perf_counter()
        if self._last_emit is not None:
            self.frame_times.append(now - self._last_emit)
        self._last_emit = now
        return out

    # -- bulk API with threaded uploads -------------------------------------

    def map(self, frames: Iterable[np.ndarray]) -> Iterator[np.ndarray]:
        """Stream frames through the pipeline with background uploader(s).

        With ``upload_threads > 1`` several host->device transfers are kept
        in flight at once (the transfer path is latency-bound over a network
        tunnel; on a TPU VM one thread already saturates PCIe). Dispatch
        order is preserved via an index-ordered reorder buffer.
        """
        jax = self._jax
        if self.upload_threads <= 1:
            done = object()
            batch = max(1, self.upload_batch)

            def uploader():
                if batch == 1:
                    for f in frames:
                        self._upload_q.put(jax.device_put(f))
                else:
                    # amortize per-transfer latency: ship `batch` frames in
                    # one device_put, hand out device-side slices (adds
                    # batch-1 frames of input latency; throughput win when
                    # the transport is latency-bound)
                    chunk = []
                    for f in frames:
                        chunk.append(f)
                        if len(chunk) == batch:
                            dev = jax.device_put(np.stack(chunk))
                            for j in range(len(chunk)):
                                self._upload_q.put(dev[j])
                            chunk = []
                    if chunk:
                        dev = jax.device_put(np.stack(chunk))
                        for j in range(len(chunk)):
                            self._upload_q.put(dev[j])
                self._upload_q.put(done)

            self._uploader = threading.Thread(target=uploader, daemon=True)
            self._uploader.start()
            while True:
                dev = self._upload_q.get()
                if dev is done:
                    break
                self.state, out = self.stream(self.state, dev)
                self._in_flight.append(out)
                if len(self._in_flight) > self.max_in_flight:
                    yield self._pop_ready()
            yield from self.drain()
            self._uploader.join()
            return

        in_q: queue.Queue = queue.Queue(maxsize=2 * self.upload_threads)
        ready: dict = {}
        cv = threading.Condition()
        n_frames = None  # set by the feeder once the input is exhausted
        next_i = 0
        window = max(self.upload_threads * 2, 4)
        abort = False  # set when the consumer raises or abandons the generator

        def feeder():
            nonlocal n_frames
            i = 0
            for f in frames:
                while not abort:
                    try:
                        in_q.put((i, f), timeout=0.1)
                        break
                    except queue.Full:
                        pass
                if abort:
                    break
                i += 1
            with cv:
                n_frames = i
                cv.notify_all()
            for _ in range(self.upload_threads):
                while not abort:
                    try:
                        in_q.put(None, timeout=0.1)
                        break
                    except queue.Full:
                        pass

        def uploader():
            while not abort:
                try:
                    item = in_q.get(timeout=0.1)
                except queue.Empty:
                    continue
                if item is None:
                    return
                i, f = item
                with cv:
                    # bound the reorder buffer relative to the consumer so
                    # device memory stays flat; the frame the consumer waits
                    # for (i == next_i) is never blocked
                    cv.wait_for(lambda: abort or i < next_i + window)
                    if abort:
                        return
                try:
                    dev = jax.device_put(f)
                    jax.block_until_ready(dev)
                except Exception:
                    try:  # one retry for transient transport errors
                        dev = jax.device_put(f)
                        jax.block_until_ready(dev)
                    except Exception as e:  # propagate to the consumer
                        dev = _UploadError(e)
                with cv:
                    ready[i] = dev
                    cv.notify_all()

        threads = [threading.Thread(target=feeder, daemon=True)]
        threads += [
            threading.Thread(target=uploader, daemon=True)
            for _ in range(self.upload_threads)
        ]
        for t in threads:
            t.start()

        try:
            while True:
                with cv:
                    cv.wait_for(
                        lambda: next_i in ready
                        or (n_frames is not None and next_i >= n_frames)
                    )
                    if n_frames is not None and next_i >= n_frames:
                        break
                    dev = ready.pop(next_i)
                    next_i += 1
                    cv.notify_all()
                if isinstance(dev, _UploadError):
                    raise dev.exc
                self.state, out = self.stream(self.state, dev)
                self._in_flight.append(out)
                if len(self._in_flight) > self.max_in_flight:
                    yield self._pop_ready()
            yield from self.drain()
        finally:
            # normal exit: threads are already done and join instantly.
            # error/abandonment: wake everything (feeder blocked on put via
            # its 0.1 s poll, uploaders on get/cv.wait_for), then join so no
            # thread or pinned frame buffer outlives the generator.
            abort = True
            with cv:
                cv.notify_all()
            for t in threads:
                t.join()
            ready.clear()

    # -- stats ---------------------------------------------------------------

    def throughput_fps(self) -> float:
        times = self.frame_times
        return 1.0 / (sum(times) / len(times)) if times else 0.0
