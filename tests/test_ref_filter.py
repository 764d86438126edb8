"""Similar-image filter: decision-for-decision parity with the reference.

Drives the reference's ``SimilarImageFilter``
(/root/reference/live2diff/image_filter.py) and ours with the SAME frame
sequence and the SAME uniform-sample stream, and asserts the skip/pass
decision sequence is identical — including the budget-reset-only-at-cap
and cap-off-by-one quirks documented in utils/filter.py.
"""

from __future__ import annotations

import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from live2diff_tpu.utils.filter import SimilarImageFilter  # noqa: E402

REF_FILE = "/root/reference/live2diff/image_filter.py"

if not os.path.isfile(REF_FILE):  # pragma: no cover
    pytest.skip("/root/reference not present", allow_module_level=True)


def load_ref_filter():
    spec = importlib.util.spec_from_file_location("ref_image_filter", REF_FILE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("threshold,max_skip", [(0.98, 10), (0.7, 2), (1.0, 3)])
def test_filter_decisions_match_reference(monkeypatch, threshold, max_skip):
    ref_mod = load_ref_filter()
    rng = np.random.RandomState(123)

    ref = ref_mod.SimilarImageFilter(threshold=threshold, max_skip_frame=max_skip)
    ours = SimilarImageFilter(threshold=threshold, max_skip_frame=max_skip)

    # both implementations must see the SAME uniform draw each frame
    holder = {"v": 0.0}

    def same_sample(*a, **k):
        return holder["v"]

    monkeypatch.setattr(ref_mod.random, "uniform", same_sample)
    ours._rng = type("R", (), {"uniform": staticmethod(same_sample)})()

    frame_rng = np.random.RandomState(0)
    base = frame_rng.rand(8, 8, 3).astype(np.float32)
    decisions_ref, decisions_ours = [], []
    for i in range(300):
        # mostly-similar frames with occasional hard cuts
        if i % 37 == 0:
            base = frame_rng.rand(8, 8, 3).astype(np.float32)
        frame = base + 0.01 * frame_rng.rand(8, 8, 3).astype(np.float32)
        holder["v"] = float(rng.uniform())
        r = ref(torch.from_numpy(frame))
        decisions_ref.append(r is not None)
        o = ours(frame)
        decisions_ours.append(o is not None)
        assert decisions_ref[-1] == decisions_ours[-1], (
            f"frame {i}: ref={'pass' if decisions_ref[-1] else 'skip'} "
            f"ours={'pass' if decisions_ours[-1] else 'skip'}"
        )

    if threshold < 1:
        assert any(not d for d in decisions_ref), "test never exercised a skip"
    else:  # threshold >= 1 disables skipping entirely (skip_prob = 0)
        assert all(decisions_ref)
    assert any(d for d in decisions_ref[1:]), "test never exercised a pass"


def test_zero_frames_match_reference(monkeypatch):
    """All-zero frames: torch CosineSimilarity(eps=1e-6) yields sim~0, so
    black frames must always PASS (never be skipped)."""
    ref_mod = load_ref_filter()
    ref = ref_mod.SimilarImageFilter(threshold=0.98, max_skip_frame=10)
    ours = SimilarImageFilter(threshold=0.98, max_skip_frame=10)

    monkeypatch.setattr(ref_mod.random, "uniform", lambda *a, **k: 0.5)
    ours._rng = type("R", (), {"uniform": staticmethod(lambda *a, **k: 0.5)})()

    zero = np.zeros((8, 8, 3), np.float32)
    for i in range(5):
        r = ref(torch.from_numpy(zero))
        o = ours(zero)
        assert (r is not None) == (o is not None) == True, i  # noqa: E712
