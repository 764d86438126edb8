"""StreamState: the complete per-stream runtime state as one pytree.

Everything the per-frame step mutates lives here, so the jitted step is a
pure function ``(params, state, frame) -> (state, output)`` whose state
buffers are donated — KV-caches and latent buffers update in place in HBM
with zero reallocation, replacing the reference's Python-object state
(/root/reference/live2diff/pipeline_stream_animation_depth.py:171-344).

Batched serving: every field carries the per-stream leading structure, so a
multi-session server can ``jax.vmap`` the step over a stacked StreamState.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class StreamState:
    rng: jax.Array
    # window bookkeeping (shared by all temporal attention layers)
    attn_mask: jnp.ndarray  # [steps, window] bool
    pe_idx: jnp.ndarray  # [steps, window] int32
    update_idx: jnp.ndarray  # [steps] int32
    # per-layer temporal KV caches: [steps, 2, window, HW_l, C_l]
    kv_caches: Tuple[jnp.ndarray, ...]
    # stream-batch latent buffers for the n-1 in-flight frames
    x_t_buffer: Optional[jnp.ndarray]  # [steps-1, h, w, 4]
    depth_buffer: Optional[jnp.ndarray]  # [steps-1, h, w, 4]
    # frame counter (drives nothing in-graph; useful for debugging/telemetry)
    frame_idx: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))
