"""Attention primitives.

Single entry point ``dot_product_attention`` in ``[..., S, H, D]`` layout so
the model code is kernel-agnostic: the default path is a plain
einsum+softmax (XLA fuses this well for the short sequences in this model),
and the Pallas flash kernel (ops/flash_attention.py) is swapped in for the
large spatial self-attention where it pays off.

Replaces the reference's xformers / torch-SDPA / TensorRT attention paths
(/root/reference/live2diff/animatediff/models/attention.py:465-560).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention.

    Args:
      q: ``[..., Sq, H, D]``
      k, v: ``[..., Sk, H, D]``
      bias: additive attention bias broadcastable to ``[..., H, Sq, Sk]``
      scale: defaults to ``D**-0.5``

    Returns ``[..., Sq, H, D]`` in q's dtype; softmax is computed in fp32.
    """
    dim = q.shape[-1]
    scale = dim**-0.5 if scale is None else scale
    logits = jnp.einsum("...qhd,...khd->...hqk", q, k).astype(jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("...hqk,...khd->...qhd", probs, v)
