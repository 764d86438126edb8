"""Cross-implementation parity: our JAX UNet vs the ACTUAL reference code.

Every other parity test in this repo checks our implementation against our
own re-derivation of the reference's semantics. This one removes that
circularity: it runs the reference's torch streaming/warmup UNets
(/root/reference/live2diff/animatediff/models/, imported via tests/refshim's
minimal diffusers shim) and our Flax UNet with SHARED weights (transferred
through the production converter, convert/torch_to_flax.py) on identical
inputs, and asserts the outputs match in fp32:

* warmup denoise (both steps) including the KV-cache contents written,
* 8 streamed frames — through window-fill AND steady-state eviction
  (window_size=4, sink_size=2 ⇒ eviction starts at frame 2),
* the window state machine (attn_bias / pe_idx / update_idx) against a
  torch transcription of the reference's host-side update loop
  (pipeline_stream_animation_depth.py:403-438).

Uses a tiny-but-real topology (channels divisible by 32 because the
reference's temporal GroupNorm hardcodes 32 groups, motion_module.py:181).
Requires /root/reference and torch; skipped otherwise.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

torch = pytest.importorskip("torch")
from refshim import load_reference_models, reference_available  # noqa: E402

if not reference_available():  # pragma: no cover
    pytest.skip("/root/reference not present", allow_module_level=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from live2diff_tpu.convert.torch_to_flax import unet_torch_to_flax  # noqa: E402
from live2diff_tpu.models.unet import UNet3DConditionModel, UNetConfig  # noqa: E402
from live2diff_tpu.stream.state_machine import (  # noqa: E402
    init_window_state,
    mask_to_bias,
    update_window_state,
)

# tiny-but-real topology
CH = (32, 32, 64, 64)
H = W = 16  # latent size; 3 downsamples -> 2x2 at the deepest level
STEPS = 2
WINDOW, SINK = 4, 2
PE_MAX = 8
PROMPT_LEN, CROSS_DIM = 7, 16
TIMESTEPS = [321, 654]

MM_KW = dict(
    num_attention_heads=2,
    num_transformer_block=1,
    attention_block_types=["Temporal_Self", "Temporal_Self"],
    temporal_position_encoding=True,
    temporal_position_encoding_max_len=PE_MAX,
    temporal_attention_dim_div=1,
    zero_initialize=True,
)
BASE_KW = dict(
    block_out_channels=CH,
    layers_per_block=2,
    attention_head_dim=2,
    cross_attention_dim=CROSS_DIM,
    norm_num_groups=32,
    use_motion_module=True,
    motion_module_resolutions=(1, 2, 4, 8),
    unet_use_cross_frame_attention=False,
    unet_use_temporal_attention=False,
    use_inflated_groupnorm=True,
    cond_mapping=True,
)


def rel_err(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-8))


def ref_update_attn_bias(attn_bias, pe_idx, update_idx):
    """Torch transcription of the reference's host-side window update
    (pipeline_stream_animation_depth.py:416-438, WARMUP_FRAMES->SINK)."""
    for idx in range(attn_bias.shape[0]):
        if torch.isinf(attn_bias[idx]).any():
            update_idx[idx] = (attn_bias[idx] == 0).sum()
        else:
            pe_idx[idx, SINK:] = pe_idx[idx, SINK:].roll(shifts=1, dims=0)
            update_idx[idx] = pe_idx[idx].argmax()
        num_unmask = int((attn_bias[idx] == 0).sum())
        attn_bias[idx, : min(num_unmask + 1, WINDOW)] = 0
    return attn_bias, pe_idx, update_idx


def ref_init_attn_bias():
    """pipeline_stream_animation_depth.py:403-414 with tiny sizes."""
    attn_mask = torch.zeros((STEPS, WINDOW), dtype=torch.bool)
    attn_mask[:, :SINK] = True
    attn_mask[0, SINK] = True
    attn_bias = torch.zeros_like(attn_mask, dtype=torch.float32)
    attn_bias.masked_fill_(attn_mask.logical_not(), float("-inf"))
    pe_idx = torch.arange(WINDOW).unsqueeze(0).repeat(STEPS, 1)
    update_idx = torch.ones(STEPS, dtype=torch.int64) * SINK
    update_idx[1] = SINK + 1
    return attn_bias, pe_idx, update_idx


@pytest.fixture(scope="module")
def ref_models():
    mods = load_reference_models()
    torch.manual_seed(0)
    us = mods["unet_depth_streaming"].UNet3DConditionStreamingModel(
        **BASE_KW,
        motion_module_type="Streaming",
        motion_module_kwargs={
            **MM_KW,
            "attention_class_name": "stream",
            "attention_kwargs": dict(window_size=WINDOW, sink_size=SINK),
        },
    )
    uw = mods["unet_depth_warmup"].UNet3DConditionWarmupModel(
        **BASE_KW,
        motion_module_type="Vanilla",
        motion_module_kwargs={**MM_KW, "attention_class_name": "versatile",
                              "attention_kwargs": {}},
    )
    # perturb away from zero-init so proj_out contributes on both sides
    with torch.no_grad():
        for name, p in us.named_parameters():
            if "proj_out" in name and "motion_modules" in name:
                p.add_(0.02 * torch.randn_like(p))
    missing, unexpected = uw.load_state_dict(us.state_dict(), strict=False)
    assert not missing and not unexpected
    us.eval(), uw.eval()
    us.set_info_for_attn(H, W)
    uw.set_info_for_attn(H, W)
    return us, uw


@pytest.fixture(scope="module")
def our_unet(ref_models):
    us, _ = ref_models
    sd = {k: v.detach().numpy() for k, v in us.state_dict().items()}
    params, skipped = unet_torch_to_flax(sd)
    # the PE table is recomputed analytically; nothing else may be dropped
    assert all(k.endswith("pos_encoder.pe") for k in skipped), skipped
    cfg = UNetConfig(
        block_out_channels=CH,
        attention_head_dim=2,
        cross_attention_dim=CROSS_DIM,
        norm_num_groups=32,
        motion_num_attention_heads=2,
        motion_pe_max_len=PE_MAX,
        window_size=WINDOW,
        sink_size=SINK,
    )
    unet = UNet3DConditionModel(config=cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    return unet, params


def _run_warmup_both(ref_models, our_unet):
    """Run the full 2-step warmup on both sides; return (outs, caches)."""
    us, uw = ref_models
    unet, params = our_unet
    rng = np.random.RandomState(42)

    ref_caches = us.prepare_cache(STEPS)
    j_caches = unet.config.init_caches(H, W, STEPS, dtype=jnp.float32)

    x = rng.randn(1, 4, SINK, H, W).astype(np.float32)
    d = rng.randn(1, 4, SINK, H, W).astype(np.float32)
    prompt = rng.randn(1, PROMPT_LEN, CROSS_DIM).astype(np.float32)

    outs = []
    for idx in range(STEPS):
        with torch.no_grad():
            ref_out = uw(
                torch.from_numpy(x),
                torch.tensor([TIMESTEPS[idx]]),
                temporal_attention_mask=None,
                depth_sample=torch.from_numpy(d),
                encoder_hidden_states=torch.from_numpy(prompt),
                kv_cache=[c[idx] for c in ref_caches],
                return_dict=True,
            )["sample"].numpy()

        j_out, j_caches = unet.apply(
            params,
            jnp.asarray(x.transpose(0, 2, 3, 4, 1)),  # [1, F, H, W, 4]
            jnp.asarray([TIMESTEPS[idx]], jnp.int32),
            jnp.asarray(prompt),
            jnp.asarray(d.transpose(0, 2, 3, 4, 1)),
            j_caches,
            "warmup",
            None,
            None,
            None,
            idx,
        )
        outs.append((ref_out, np.asarray(j_out).transpose(0, 4, 1, 2, 3)))
        # fresh noise-free chaining: feed a deterministic mix as next input
        x = 0.5 * x + 0.25 * outs[-1][0]
    return outs, ref_caches, j_caches


@pytest.fixture(scope="module")
def warmup_run(ref_models, our_unet):
    return _run_warmup_both(ref_models, our_unet)


def test_warmup_output_parity(warmup_run):
    outs, _, _ = warmup_run
    for idx, (ref_out, j_out) in enumerate(outs):
        err = rel_err(j_out, ref_out)
        assert err < 2e-4, f"warmup step {idx}: rel err {err:.2e}"


def test_warmup_cache_parity(warmup_run):
    _, ref_caches, j_caches = warmup_run
    assert len(ref_caches) == len(j_caches)
    for i, (rc, jc) in enumerate(zip(ref_caches, j_caches)):
        # ref [steps, 2, HW, window, C] -> ours [steps, 2, window, C, HW]
        rc = rc.numpy().transpose(0, 1, 3, 4, 2)
        err = rel_err(np.asarray(jc), rc)
        assert err < 2e-4, f"cache {i}: rel err {err:.2e}"


def test_stream_parity_through_eviction(ref_models, our_unet, warmup_run):
    us, _ = ref_models
    unet, params = our_unet
    _, ref_caches, j_caches = warmup_run
    rng = np.random.RandomState(7)

    attn_bias, pe_idx, update_idx = ref_init_attn_bias()
    j_mask, j_pe, j_upd = init_window_state(STEPS, WINDOW, SINK)

    prompt = rng.randn(1, PROMPT_LEN, CROSS_DIM).astype(np.float32)
    prompt2 = np.repeat(prompt, STEPS, axis=0)
    t = np.asarray(TIMESTEPS, np.int64)

    for frame in range(8):
        # the two state machines must agree exactly
        np.testing.assert_array_equal(
            np.asarray(j_pe), pe_idx.numpy(), err_msg=f"pe_idx frame {frame}")
        np.testing.assert_array_equal(
            np.asarray(j_upd), update_idx.numpy(), err_msg=f"update_idx frame {frame}")
        np.testing.assert_array_equal(
            np.asarray(j_mask), (attn_bias == 0).numpy(), err_msg=f"mask frame {frame}")

        x = rng.randn(STEPS, 4, 1, H, W).astype(np.float32)
        d = rng.randn(STEPS, 4, 1, H, W).astype(np.float32)

        with torch.no_grad():
            ref_out = us(
                torch.from_numpy(x),
                torch.from_numpy(t),
                encoder_hidden_states=torch.from_numpy(prompt2),
                temporal_attention_mask=attn_bias,
                depth_sample=torch.from_numpy(d),
                kv_cache=ref_caches,
                pe_idx=pe_idx,
                update_idx=update_idx,
                return_dict=True,
            )["sample"].numpy()

        j_out, j_caches = unet.apply(
            params,
            jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
            jnp.asarray(t, jnp.int32),
            jnp.asarray(prompt2),
            jnp.asarray(d.transpose(0, 2, 3, 4, 1)),
            j_caches,
            "stream",
            mask_to_bias(j_mask, dtype=jnp.float32),
            j_pe,
            j_upd,
        )
        err = rel_err(np.asarray(j_out).transpose(0, 4, 1, 2, 3), ref_out)
        assert err < 2e-4, f"stream frame {frame}: rel err {err:.2e}"

        attn_bias, pe_idx, update_idx = ref_update_attn_bias(attn_bias, pe_idx, update_idx)
        j_mask, j_pe, j_upd = update_window_state(j_mask, j_pe, j_upd, SINK)

    # steady-state caches still agree after eviction cycles
    for i, (rc, jc) in enumerate(zip(ref_caches, j_caches)):
        rc = rc.numpy().transpose(0, 1, 3, 4, 2)
        err = rel_err(np.asarray(jc), rc)
        assert err < 2e-4, f"post-stream cache {i}: rel err {err:.2e}"


# ---------------------------------------------------------------------------
# SparseCausalAttention (unet_use_cross_frame_attention: true)
# ---------------------------------------------------------------------------


def test_sparse_causal_attention_class_parity():
    """Our cross_frame CrossAttention vs the reference SparseCausalAttention
    (attention.py:563-622) with shared weights: keys from frame 0, values
    per-frame (the reference's frame-0 value gather is commented out)."""
    from live2diff_tpu.models.attention import CrossAttention

    mods = load_reference_models()
    torch.manual_seed(3)
    dim, heads, dim_head, f, b, d = 32, 2, 16, 4, 2, 12
    ref = mods["attention"].SparseCausalAttention(
        query_dim=dim, heads=heads, dim_head=dim_head
    )
    ref.eval()

    x = np.random.RandomState(5).randn(b * f, d, dim).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), video_length=f).numpy()

    ours = CrossAttention(
        query_dim=dim, heads=heads, dim_head=dim_head, cross_frame=True,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    params = {"params": {
        "to_q": {"kernel": jnp.asarray(ref.to_q.weight.detach().numpy().T)},
        "to_k": {"kernel": jnp.asarray(ref.to_k.weight.detach().numpy().T)},
        "to_v": {"kernel": jnp.asarray(ref.to_v.weight.detach().numpy().T)},
        "to_out_0": {
            "kernel": jnp.asarray(ref.to_out[0].weight.detach().numpy().T),
            "bias": jnp.asarray(ref.to_out[0].bias.detach().numpy()),
        },
    }}
    j_out = np.asarray(ours.apply(params, jnp.asarray(x), video_length=f))
    err = rel_err(j_out, ref_out)
    assert err < 1e-5, f"sparse-causal attention rel err {err:.2e}"

    # sanity: the frame-0-keys semantics actually bites (frames 1.. differ
    # from plain self-attention)
    plain = CrossAttention(
        query_dim=dim, heads=heads, dim_head=dim_head, cross_frame=False,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    p_out = np.asarray(plain.apply(params, jnp.asarray(x)))
    assert not np.allclose(j_out[1:f], p_out[1:f], atol=1e-4)
    np.testing.assert_allclose(j_out[0], p_out[0], rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def ref_models_cf():
    """Reference UNets built with unet_use_cross_frame_attention=True."""
    mods = load_reference_models()
    torch.manual_seed(1)
    kw = dict(BASE_KW, unet_use_cross_frame_attention=True)
    us = mods["unet_depth_streaming"].UNet3DConditionStreamingModel(
        **kw,
        motion_module_type="Streaming",
        motion_module_kwargs={
            **MM_KW,
            "attention_class_name": "stream",
            "attention_kwargs": dict(window_size=WINDOW, sink_size=SINK),
        },
    )
    uw = mods["unet_depth_warmup"].UNet3DConditionWarmupModel(
        **kw,
        motion_module_type="Vanilla",
        motion_module_kwargs={**MM_KW, "attention_class_name": "versatile",
                              "attention_kwargs": {}},
    )
    with torch.no_grad():
        for name, p in us.named_parameters():
            if "proj_out" in name and "motion_modules" in name:
                p.add_(0.02 * torch.randn_like(p))
    missing, unexpected = uw.load_state_dict(us.state_dict(), strict=False)
    assert not missing and not unexpected
    us.eval(), uw.eval()
    us.set_info_for_attn(H, W)
    uw.set_info_for_attn(H, W)
    return us, uw


def test_cross_frame_unet_warmup_and_stream_parity(ref_models_cf):
    """Full-UNet parity with SparseCausalAttention enabled: one warmup step
    (video_length=SINK exercises the frame-0-keys path) and one stream
    frame (video_length=1, degenerate)."""
    us, uw = ref_models_cf
    sd = {k: v.detach().numpy() for k, v in us.state_dict().items()}
    params, skipped = unet_torch_to_flax(sd)
    assert all(k.endswith("pos_encoder.pe") for k in skipped), skipped
    cfg = UNetConfig(
        block_out_channels=CH,
        attention_head_dim=2,
        cross_attention_dim=CROSS_DIM,
        norm_num_groups=32,
        motion_num_attention_heads=2,
        motion_pe_max_len=PE_MAX,
        window_size=WINDOW,
        sink_size=SINK,
        unet_use_cross_frame_attention=True,
    )
    unet = UNet3DConditionModel(config=cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    rng = np.random.RandomState(11)

    ref_caches = us.prepare_cache(STEPS)
    j_caches = cfg.init_caches(H, W, STEPS, dtype=jnp.float32)

    # warmup step 0
    x = rng.randn(1, 4, SINK, H, W).astype(np.float32)
    d = rng.randn(1, 4, SINK, H, W).astype(np.float32)
    prompt = rng.randn(1, PROMPT_LEN, CROSS_DIM).astype(np.float32)
    with torch.no_grad():
        ref_out = uw(
            torch.from_numpy(x), torch.tensor([TIMESTEPS[0]]),
            temporal_attention_mask=None,
            depth_sample=torch.from_numpy(d),
            encoder_hidden_states=torch.from_numpy(prompt),
            kv_cache=[c[0] for c in ref_caches],
            return_dict=True,
        )["sample"].numpy()
    j_out, j_caches = unet.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        jnp.asarray([TIMESTEPS[0]], jnp.int32), jnp.asarray(prompt),
        jnp.asarray(d.transpose(0, 2, 3, 4, 1)), j_caches,
        "warmup", None, None, None, 0,
    )
    err = rel_err(np.asarray(j_out).transpose(0, 4, 1, 2, 3), ref_out)
    assert err < 2e-4, f"cross-frame warmup: rel err {err:.2e}"

    # one stream frame
    attn_bias, pe_idx, update_idx = ref_init_attn_bias()
    j_mask, j_pe, j_upd = init_window_state(STEPS, WINDOW, SINK)
    x = rng.randn(STEPS, 4, 1, H, W).astype(np.float32)
    d = rng.randn(STEPS, 4, 1, H, W).astype(np.float32)
    prompt2 = np.repeat(prompt, STEPS, axis=0)
    t = np.asarray(TIMESTEPS, np.int64)
    with torch.no_grad():
        ref_out = us(
            torch.from_numpy(x), torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(prompt2),
            temporal_attention_mask=attn_bias,
            depth_sample=torch.from_numpy(d),
            kv_cache=ref_caches, pe_idx=pe_idx, update_idx=update_idx,
            return_dict=True,
        )["sample"].numpy()
    j_out, j_caches = unet.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        jnp.asarray(t, jnp.int32), jnp.asarray(prompt2),
        jnp.asarray(d.transpose(0, 2, 3, 4, 1)), j_caches,
        "stream", mask_to_bias(j_mask, dtype=jnp.float32), j_pe, j_upd,
    )
    err = rel_err(np.asarray(j_out).transpose(0, 4, 1, 2, 3), ref_out)
    assert err < 2e-4, f"cross-frame stream: rel err {err:.2e}"
