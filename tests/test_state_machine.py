"""Tests for the window/PE/eviction state machine.

Includes a direct numpy re-derivation of the reference's host-side loop
(/root/reference/live2diff/pipeline_stream_animation_depth.py:403-438) as a
golden model, plus property tests.
"""

import numpy as np
import pytest

from live2diff_tpu.stream.state_machine import (
    WARMUP_FRAMES,
    WINDOW_SIZE,
    init_window_state,
    mask_to_bias,
    update_window_state,
)

pytestmark = pytest.mark.fast


# --- golden model: literal (loopy) reimplementation of the reference logic ---


def golden_init(num_steps):
    mask = np.zeros((num_steps, WINDOW_SIZE), dtype=bool)
    mask[:, :WARMUP_FRAMES] = True
    mask[0, WARMUP_FRAMES] = True
    pe = np.tile(np.arange(WINDOW_SIZE), (num_steps, 1))
    upd = np.full(num_steps, WARMUP_FRAMES, dtype=np.int64)
    if num_steps > 1:
        upd[1] = WARMUP_FRAMES + 1
    return mask, pe, upd


def golden_update(mask, pe, upd):
    mask, pe, upd = mask.copy(), pe.copy(), upd.copy()
    for i in range(mask.shape[0]):
        if not mask[i].all():
            upd[i] = mask[i].sum()
        else:
            pe[i, WARMUP_FRAMES:] = np.roll(pe[i, WARMUP_FRAMES:], 1)
            upd[i] = pe[i].argmax()
        num_unmask = mask[i].sum()
        mask[i, : min(num_unmask + 1, WINDOW_SIZE)] = True
    return mask, pe, upd


def test_matches_golden_model_over_long_stream():
    for num_steps in (1, 2, 3, 4):
        mask_j, pe_j, upd_j = init_window_state(num_steps)
        mask_g, pe_g, upd_g = golden_init(num_steps)
        np.testing.assert_array_equal(np.asarray(mask_j), mask_g)
        np.testing.assert_array_equal(np.asarray(pe_j), pe_g)
        np.testing.assert_array_equal(np.asarray(upd_j), upd_g)
        for frame in range(40):
            mask_j, pe_j, upd_j = update_window_state(mask_j, pe_j, upd_j)
            mask_g, pe_g, upd_g = golden_update(mask_g, pe_g, upd_g)
            np.testing.assert_array_equal(np.asarray(mask_j), mask_g, err_msg=f"mask f{frame}")
            np.testing.assert_array_equal(np.asarray(pe_j), pe_g, err_msg=f"pe f{frame}")
            np.testing.assert_array_equal(np.asarray(upd_j), upd_g, err_msg=f"upd f{frame}")


def test_pe_stays_a_permutation():
    mask, pe, upd = init_window_state(3)
    for _ in range(64):
        mask, pe, upd = update_window_state(mask, pe, upd)
        for row in np.asarray(pe):
            assert sorted(row.tolist()) == list(range(WINDOW_SIZE))


def test_sink_slots_never_evicted():
    mask, pe, upd = init_window_state(2)
    for _ in range(64):
        assert np.all(np.asarray(upd) >= WARMUP_FRAMES), "write must never hit sink slots"
        mask, pe, upd = update_window_state(mask, pe, upd)


def test_mask_monotone_then_full():
    mask, pe, upd = init_window_state(2)
    prev_counts = np.asarray(mask).sum(axis=1)
    for _ in range(32):
        mask, pe, upd = update_window_state(mask, pe, upd)
        counts = np.asarray(mask).sum(axis=1)
        assert np.all(counts >= prev_counts)
        assert np.all(counts <= WINDOW_SIZE)
        prev_counts = counts
    assert np.all(prev_counts == WINDOW_SIZE)


def test_stale_slot_never_visible():
    """Row 1 writes slot 9 on frame 1 while it is masked; that slot must be
    overwritten before it is ever unmasked."""
    num_steps = 2
    mask, pe, upd = init_window_state(num_steps)
    # track, per row, the frame at which each slot was last written
    written_at = -np.ones((num_steps, WINDOW_SIZE), dtype=int)
    visible_since_written = np.zeros((num_steps, WINDOW_SIZE), dtype=bool)
    for frame in range(40):
        m, u = np.asarray(mask), np.asarray(upd)
        for i in range(num_steps):
            written_at[i, u[i]] = frame
        mask, pe, upd = update_window_state(mask, pe, upd)
        m2 = np.asarray(mask)
        for i in range(num_steps):
            for s in range(WARMUP_FRAMES, WINDOW_SIZE):
                if m2[i, s] and written_at[i, s] >= 0:
                    visible_since_written[i, s] = True
    # every non-sink slot that became visible had been written at least once
    # after the stream started (i.e. no slot is visible while holding only
    # its initial zeros from a masked-era write)
    assert visible_since_written[:, WARMUP_FRAMES:].all()


def test_mask_to_bias():
    mask, _, _ = init_window_state(2)
    bias = np.asarray(mask_to_bias(mask))
    assert np.all(bias[np.asarray(mask)] == 0)
    assert np.all(np.isneginf(bias[~np.asarray(mask)]))
