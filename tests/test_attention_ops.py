"""Blockwise attention must match dense attention exactly (up to fp error)."""

import jax
import jax.numpy as jnp
import numpy as np

from live2diff_tpu.ops.attention import (
    _blockwise_attention,
    _dense_attention,
    dot_product_attention,
)


def test_blockwise_matches_dense_no_bias():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 64, 3, 8), jnp.float32)
    k = jnp.asarray(rng.randn(2, 200, 3, 8), jnp.float32)  # non-multiple of chunk
    v = jnp.asarray(rng.randn(2, 200, 3, 8), jnp.float32)
    dense = _dense_attention(q, k, v, None, 8**-0.5)
    block = _blockwise_attention(q, k, v, None, 8**-0.5, chunk=64)
    np.testing.assert_allclose(np.asarray(block), np.asarray(dense), rtol=2e-5, atol=2e-5)


def test_blockwise_matches_dense_with_bias():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(2, 32, 2, 8), jnp.float32)
    k = jnp.asarray(rng.randn(2, 150, 2, 8), jnp.float32)
    v = jnp.asarray(rng.randn(2, 150, 2, 8), jnp.float32)
    bias = jnp.asarray(
        np.where(rng.rand(2, 2, 32, 150) > 0.3, 0.0, -np.inf), jnp.float32
    )
    dense = _dense_attention(q, k, v, bias, 8**-0.5)
    block = _blockwise_attention(q, k, v, bias, 8**-0.5, chunk=64)
    np.testing.assert_allclose(np.asarray(block), np.asarray(dense), rtol=2e-5, atol=2e-5)


def test_dispatch_large_seq_uses_blockwise():
    rng = np.random.RandomState(2)
    # large enough to trip the blockwise path
    q = jnp.asarray(rng.randn(1, 4096, 2, 8), jnp.float32)
    k = jnp.asarray(rng.randn(1, 4096, 2, 8), jnp.float32)
    v = jnp.asarray(rng.randn(1, 4096, 2, 8), jnp.float32)
    out = dot_product_attention(q, k, v)
    ref = _dense_attention(q[:, :128], k, v, None, 8**-0.5)
    np.testing.assert_allclose(np.asarray(out[:, :128]), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_blockwise_under_jit_and_grad_free_path():
    q = jnp.ones((1, 2048, 1, 8))
    k = jnp.ones((1, 2048, 1, 8))
    v = jnp.ones((1, 2048, 1, 8))
    out = jax.jit(dot_product_attention)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)
