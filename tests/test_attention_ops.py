"""Blockwise attention must match dense attention exactly (up to fp error)."""

import jax
import jax.numpy as jnp
import numpy as np

from live2diff_tpu.ops.attention import (
    _blockwise_attention,
    _dense_attention,
    dot_product_attention,
)
import pytest

pytestmark = pytest.mark.fast


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


def test_flash_kernel_matches_dense_interpret():
    """Pallas flash kernel == dense attention (interpret mode, runs on CPU)."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from live2diff_tpu.ops.attention import _dense_attention
    from live2diff_tpu.ops.flash_attention import flash_self_attention

    rs = np.random.RandomState(0)
    b, h, s, d = 2, 3, 1024, 40
    q = jnp.asarray(rs.randn(b, h, s, d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, h, s, d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, h, s, d).astype(np.float32))
    scale = d ** -0.5

    with pltpu.force_tpu_interpret_mode():
        out = flash_self_attention(q, k, v, scale=scale, block_q=256, block_k=512)

    # dense reference works in [B, S, H, D]
    ref = _dense_attention(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        None, scale,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.swapaxes(ref, 1, 2)), atol=2e-5, rtol=2e-5
    )


def test_flash_int8_matches_dense_interpret():
    """int8-QK flash == dense attention within quantisation tolerance.

    Per-(batch, head) symmetric int8 with key mean-centring; the dropped
    ``q . k_mean`` softmax-shift term is exact, so the only error source is
    the ~1/254 relative rounding of q and centred k."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from live2diff_tpu.ops.attention import _dense_attention
    from live2diff_tpu.ops.flash_attention import flash_self_attention_int8

    rs = np.random.RandomState(2)
    b, h, s, d = 2, 3, 1024, 40
    q = jnp.asarray(rs.randn(b, h, s, d).astype(np.float32))
    # non-zero K mean: exercises the centring (softmax-invariance) path
    k = jnp.asarray((rs.randn(b, h, s, d) + 0.7).astype(np.float32))
    v = jnp.asarray(rs.randn(b, h, s, d).astype(np.float32))
    scale = d ** -0.5

    with pltpu.force_tpu_interpret_mode():
        out = flash_self_attention_int8(
            q, k, v, scale=scale, block_q=256, block_k=512
        )

    ref = _dense_attention(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        None, scale,
    )
    err = np.abs(np.asarray(out) - np.asarray(jnp.swapaxes(ref, 1, 2)))
    # int8 logit noise perturbs softmax weights slightly; outputs are convex
    # combinations of v so absolute error stays well under |v| scale
    assert err.max() < 0.05, err.max()
    assert err.mean() < 0.005, err.mean()


def test_flash_dmajor_matches_dense_interpret():
    """D-major flash kernel (head_dim on sublanes) == dense attention."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from live2diff_tpu.ops.attention import _dense_attention
    from live2diff_tpu.ops.flash_attention import flash_self_attention_dmajor

    rs = np.random.RandomState(1)
    b, h, s, d = 2, 3, 1024, 40
    q = jnp.asarray(rs.randn(b, h, s, d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, h, s, d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, h, s, d).astype(np.float32))
    scale = d ** -0.5

    with pltpu.force_tpu_interpret_mode():
        out = flash_self_attention_dmajor(
            q, k, v, scale=scale, block_q=256, block_k=512
        )

    ref = _dense_attention(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        None, scale,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.swapaxes(ref, 1, 2)), atol=2e-5, rtol=2e-5
    )


def test_stream_window_kernel_matches_xla_interpret():
    """Pallas stream-window kernel == XLA einsum fallback (interpret mode)."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    import live2diff_tpu.ops.attention as A

    rs = np.random.RandomState(1)
    s, hw, heads, dh, window = 2, 64, 4, 8, 16
    c = heads * dh
    q = jnp.asarray(rs.randn(s, hw, c).astype(np.float32))
    cache = jnp.asarray(rs.randn(s, 2, window, c, hw).astype(np.float32))
    pe_q = jnp.asarray(rs.randn(s, c).astype(np.float32))
    pe_k = jnp.asarray(rs.randn(s, window, c).astype(np.float32))
    pe_v = jnp.asarray(rs.randn(s, window, c).astype(np.float32))
    bias = jnp.asarray((rs.rand(s, window) > 0.3).astype(np.float32) * -1e9)

    ref = A.stream_window_attention(q, cache, pe_q, pe_k, pe_v, bias, heads)

    # force the kernel route under the interpreter
    old = A._BACKEND
    A._BACKEND = "tpu"
    try:
        with pltpu.force_tpu_interpret_mode():
            out = A.stream_window_attention(q, cache, pe_q, pe_k, pe_v, bias, heads)
    finally:
        A._BACKEND = old
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_conv3x3_kernel_matches_lax_interpret():
    """Pallas fused conv == lax.conv (+bias+skip+relu), interpret mode."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from live2diff_tpu.ops.conv import conv3x3_fused

    rs = np.random.RandomState(3)
    b, h, w, c = 2, 32, 48, 32
    x = jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
    kern = jnp.asarray(rs.randn(3, 3, c, c).astype(np.float32) * 0.1)
    bias = jnp.asarray(rs.randn(c).astype(np.float32))
    skip = jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))

    ref = jax.lax.conv_general_dilated(
        x, kern, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias + skip
    ref = jnp.maximum(ref, 0.0)

    with pltpu.force_tpu_interpret_mode():
        out = conv3x3_fused(x, kern, bias, skip=skip, relu=True, block_h=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_conv3x3_packed_matches_lax_interpret():
    """W-packed conv path (pack>1, incl. cin=3) == lax.conv, interpret mode."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from live2diff_tpu.ops.conv import _pick_pack, conv3x3_fused

    rs = np.random.RandomState(4)
    for (h, w, cin, cout) in [(16, 128, 64, 64), (16, 256, 3, 16), (16, 128, 32, 32)]:
        assert _pick_pack(w, cin) > 1, (w, cin)
        x = jnp.asarray(rs.randn(1, h, w, cin).astype(np.float32))
        kern = jnp.asarray(rs.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
        bias = jnp.asarray(rs.randn(cout).astype(np.float32))
        skip = jnp.asarray(rs.randn(1, h, w, cout).astype(np.float32))

        ref = jax.lax.conv_general_dilated(
            x, kern, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias + skip
        ref = jnp.maximum(ref, 0.0)

        with pltpu.force_tpu_interpret_mode():
            out = conv3x3_fused(x, kern, bias, skip=skip, relu=True, block_h=8)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4,
            err_msg=f"shape {(h, w, cin, cout)}",
        )


def test_conv3x3_single_block_matches_lax_interpret():
    """nblocks==1 halo path (whole image in one row band), interpret mode."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from live2diff_tpu.ops.conv import conv3x3_fused

    rs = np.random.RandomState(6)
    b, h, w, c = 1, 8, 48, 32
    x = jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
    kern = jnp.asarray(rs.randn(3, 3, c, c).astype(np.float32) * 0.1)
    bias = jnp.asarray(rs.randn(c).astype(np.float32))

    ref = jax.lax.conv_general_dilated(
        x, kern, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    ref = jnp.maximum(ref, 0.0)

    with pltpu.force_tpu_interpret_mode():
        out = conv3x3_fused(x, kern, bias, relu=True, block_h=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_conv3x3_s2_matches_lax_interpret():
    """Stride-2 fused conv == lax.conv stride 2 pad 1, interpret mode."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from live2diff_tpu.ops.conv import conv3x3_s2_fused

    rs = np.random.RandomState(5)
    # (multi-block, single-block) x (64ch TAESD shape, non-pow2 channels)
    for (b, h, w, cin, cout, bh) in [(2, 32, 64, 64, 64, 8), (1, 16, 128, 32, 32, 8)]:
        x = jnp.asarray(rs.randn(b, h, w, cin).astype(np.float32))
        kern = jnp.asarray(rs.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
        bias = jnp.asarray(rs.randn(cout).astype(np.float32))

        ref = jax.lax.conv_general_dilated(
            x, kern, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias

        with pltpu.force_tpu_interpret_mode():
            out = conv3x3_s2_fused(x, kern, bias, block_h=bh)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4,
            err_msg=f"shape {(b, h, w, cin, cout)}",
        )


def test_group_norm_kernel_matches_flax_interpret(monkeypatch):
    """Pallas fused GroupNorm(+act) == flax nn.GroupNorm (+act), interpret."""
    import numpy as np
    from flax import linen as nn
    from jax.experimental.pallas import tpu as pltpu

    from live2diff_tpu.ops import attention as A
    from live2diff_tpu.ops import norm
    from live2diff_tpu.ops.norm import group_norm_act

    # the production default gates (LIVE2DIFF_GN_TAGS="none") reject every
    # site — lift them and count kernel entries so this test cannot silently
    # compare the XLA fallback against itself
    monkeypatch.setattr(norm, "_GN_SITE_TAGS", set())
    kernel_calls = []
    real_kernel = norm._group_norm_kernel
    monkeypatch.setattr(
        norm, "_group_norm_kernel",
        lambda *a, **k: (kernel_calls.append(1), real_kernel(*a, **k))[1],
    )

    rs = np.random.RandomState(5)
    for (b, t, c, act) in [(2, 64, 320, "silu"), (3, 128, 64, "relu"), (2, 96, 1280, "none")]:
        x = jnp.asarray(rs.randn(b, t, c).astype(np.float32) * 3 + 1)
        gamma = jnp.asarray(rs.randn(c).astype(np.float32))
        beta = jnp.asarray(rs.randn(c).astype(np.float32))

        gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32)
        ref = gn.apply({"params": {"scale": gamma, "bias": beta}}, x)
        if act == "silu":
            ref = jax.nn.silu(ref)
        elif act == "relu":
            ref = jnp.maximum(ref, 0.0)

        # fallback (XLA) path
        out_fb = group_norm_act(x, gamma, beta, groups=32, eps=1e-5, act=act)
        np.testing.assert_allclose(np.asarray(out_fb), np.asarray(ref), atol=2e-4, rtol=2e-4)

        # kernel path under the interpreter
        old = A._BACKEND
        A._BACKEND = "tpu"
        try:
            with pltpu.force_tpu_interpret_mode():
                out_k = group_norm_act(x, gamma, beta, groups=32, eps=1e-5, act=act)
        finally:
            A._BACKEND = old
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(ref), atol=2e-4, rtol=2e-4)
    assert kernel_calls, "Pallas GroupNorm kernel was never entered"


def test_layer_norm_kernel_matches_flax_interpret(monkeypatch):
    """Pallas fused LayerNorm == flax nn.LayerNorm (interpret + fallback)."""
    import numpy as np
    from flax import linen as nn
    from jax.experimental.pallas import tpu as pltpu

    from live2diff_tpu.ops import attention as A
    from live2diff_tpu.ops import norm
    from live2diff_tpu.ops.norm import layer_norm

    # default gate is LIVE2DIFF_LN_TAGS="vit"; site="" would silently take
    # the XLA fallback — lift the gate and require the kernel to be entered
    monkeypatch.setattr(norm, "_LN_SITE_TAGS", set())
    kernel_calls = []
    real_kernel = norm._layer_norm_kernel
    monkeypatch.setattr(
        norm, "_layer_norm_kernel",
        lambda *a, **k: (kernel_calls.append(1), real_kernel(*a, **k))[1],
    )

    rs = np.random.RandomState(6)
    for shape in [(2, 200, 320), (1, 577, 768)]:
        c = shape[-1]
        x = jnp.asarray(rs.randn(*shape).astype(np.float32) * 2 + 0.5)
        gamma = jnp.asarray(rs.randn(c).astype(np.float32))
        beta = jnp.asarray(rs.randn(c).astype(np.float32))

        ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        ref = ln.apply({"params": {"scale": gamma, "bias": beta}}, x)

        out_fb = layer_norm(x, gamma, beta, eps=1e-5)
        np.testing.assert_allclose(np.asarray(out_fb), np.asarray(ref), atol=2e-4, rtol=2e-4)

        old = A._BACKEND
        A._BACKEND = "tpu"
        try:
            with pltpu.force_tpu_interpret_mode():
                out_k = layer_norm(x, gamma, beta, eps=1e-5)
        finally:
            A._BACKEND = old
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(ref), atol=2e-4, rtol=2e-4)
    assert kernel_calls, "Pallas LayerNorm kernel was never entered"


def test_conv3x3_custom_vmap_folds_sessions():
    """vmapping the fused conv folds the session axis into the batch grid
    (custom_vmap), matching per-slice results — the multi-session serving
    path (stream/multi.py) vmaps the whole frame step over stream state."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from live2diff_tpu.ops.conv import conv3x3_fused

    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(3, 2, 16, 16, 8).astype(np.float32))
    w = jnp.asarray(rs.randn(3, 3, 8, 8).astype(np.float32))
    b = jnp.asarray(rs.randn(8).astype(np.float32))
    skip = jnp.asarray(rs.randn(3, 2, 16, 16, 8).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        out_v = jax.vmap(lambda xx, ss: conv3x3_fused(xx, w, b, ss))(x, skip)
        ref = jnp.stack([conv3x3_fused(x[i], w, b, skip[i]) for i in range(3)])
        np.testing.assert_allclose(np.asarray(out_v), np.asarray(ref), atol=1e-5)
        out_v2 = jax.vmap(lambda xx: conv3x3_fused(xx, w, b, relu=False))(x)
        ref2 = jnp.stack([conv3x3_fused(x[i], w, b, relu=False) for i in range(3)])
        np.testing.assert_allclose(np.asarray(out_v2), np.asarray(ref2), atol=1e-5)


def test_stream_window_kernel_int8_matches_xla_interpret():
    """Pallas int8 stream-window kernel == XLA fallback dequant (interpret)."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    import live2diff_tpu.ops.attention as A

    rs = np.random.RandomState(2)
    s, hw, heads, dh, window = 2, 128, 4, 8, 16
    c = heads * dh
    q = jnp.asarray(rs.randn(s, hw, c).astype(np.float32))
    data = jnp.asarray(rs.randint(-127, 128, (s, 2, window, c, hw)).astype(np.int8))
    scales = jnp.asarray((rs.rand(s, 2, window, c) * 0.05 + 0.01).astype(np.float32))
    cache = (data, scales)
    pe_q = jnp.asarray(rs.randn(s, c).astype(np.float32))
    pe_k = jnp.asarray(rs.randn(s, window, c).astype(np.float32))
    pe_v = jnp.asarray(rs.randn(s, window, c).astype(np.float32))
    bias = jnp.asarray((rs.rand(s, window) > 0.3).astype(np.float32) * -1e9)

    ref = A.stream_window_attention(q, cache, pe_q, pe_k, pe_v, bias, heads)

    old = A._BACKEND
    A._BACKEND = "tpu"
    try:
        with pltpu.force_tpu_interpret_mode():
            out = A.stream_window_attention(q, cache, pe_q, pe_k, pe_v, bias, heads)
    finally:
        A._BACKEND = old
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)
