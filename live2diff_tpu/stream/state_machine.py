"""Attention-window bookkeeping for the streaming KV-cache.

The temporal attention of every motion module attends over a fixed
``WINDOW_SIZE=16``-slot cache per denoising step. The first ``sink_size=8``
slots hold the warmup frames and are never evicted (attention-sink /
StreamingLLM style); the remaining slots are filled left-to-right and then
recycled with an LRU-by-positional-index scheme. Three small integer arrays,
shared by all 40 attention layers, drive this:

* ``attn_mask``  [steps, window] bool — which slots are visible this frame,
* ``pe_idx``     [steps, window] int32 — positional-encoding index per slot,
* ``update_idx`` [steps] int32 — the slot each step writes its new K/V into.

Reference semantics (re-derived, not copied):
/root/reference/live2diff/pipeline_stream_animation_depth.py:403-438. The
reference updates these with a data-dependent Python loop on the host; here
the update is a branchless jittable function (``jnp.where`` over vmapped
rows) so it fuses into the single compiled stream step.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

WARMUP_FRAMES = 8
WINDOW_SIZE = 16


def init_window_state(
    num_steps: int,
    window_size: int = WINDOW_SIZE,
    sink_size: int = WARMUP_FRAMES,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Initial (attn_mask, pe_idx, update_idx) after warmup.

    All rows see the ``sink_size`` warmup slots; row 0 (the noisiest step,
    which processes the genuinely-new frame) additionally sees the slot it is
    about to write. Row 1 initially writes one slot further right — that slot
    is overwritten before it is ever unmasked, so no garbage leaks into
    attention (see tests/test_state_machine.py::test_stale_slot_never_visible).
    """
    mask = jnp.zeros((num_steps, window_size), dtype=bool)
    mask = mask.at[:, :sink_size].set(True)
    mask = mask.at[0, sink_size].set(True)

    pe_idx = jnp.tile(jnp.arange(window_size, dtype=jnp.int32)[None], (num_steps, 1))

    update_idx = jnp.full((num_steps,), sink_size, dtype=jnp.int32)
    if num_steps > 1:
        update_idx = update_idx.at[1].set(sink_size + 1)
    return mask, pe_idx, update_idx


@partial(jax.jit, static_argnames=("sink_size",))
def update_window_state(
    attn_mask: jnp.ndarray,
    pe_idx: jnp.ndarray,
    update_idx: jnp.ndarray,
    sink_size: int = WARMUP_FRAMES,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Advance the window state by one frame (called after each UNet step).

    Per row: while the window still has masked slots, the next write goes to
    the first unfilled slot and PEs stay absolute; once full, the non-sink
    PEs roll by one (so the slot holding the max PE is the oldest) and that
    max-PE slot is evicted. One extra slot is unmasked each frame until all
    ``window_size`` are visible.
    """
    window_size = attn_mask.shape[-1]

    def row(mask, pe, upd):
        del upd  # next write slot is fully determined by mask/pe
        full = jnp.all(mask)
        filled = jnp.sum(mask.astype(jnp.int32))

        # Once full: roll the non-sink PE indices by one.
        pe_tail = pe[sink_size:]
        rolled = jnp.roll(pe_tail, 1)
        new_pe = jnp.where(full, jnp.concatenate([pe[:sink_size], rolled]), pe)

        new_upd = jnp.where(full, jnp.argmax(new_pe).astype(jnp.int32), filled)

        num_unmask = jnp.minimum(filled + 1, window_size)
        new_mask = jnp.arange(window_size) < num_unmask
        return new_mask, new_pe, new_upd

    return jax.vmap(row)(attn_mask, pe_idx, update_idx)


def mask_to_bias(attn_mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Bool visibility mask -> additive attention bias (0 / -inf)."""
    neg = jnp.asarray(float("-inf"), dtype=dtype)
    return jnp.where(attn_mask, jnp.zeros((), dtype=dtype), neg)
