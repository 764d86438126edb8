"""END-TO-END stream-runtime parity vs the reference pipeline.

tests/test_ref_parity.py proves UNet-level parity; this file closes the
remaining re-derivation circularity (VERDICT r3 item 1) by running the
reference's ACTUAL ``StreamAnimateDiffusionDepth``
(/root/reference/live2diff/pipeline_stream_animation_depth.py:24-660) on CPU
— real warmup loop, stream-batch buffer lag, LCM c_skip/c_out/sqrt-alpha
math, depth min-max normalisation, noise re-injection, window state machine
— against our ``StreamDiffusionDepth`` with:

* the SAME UNet weights (refanim torch model -> production converter),
* a SHARED micro VAE and depth model (einsum-mirrored exactly in both
  frameworks — the full VAE/MiDaS have their own parity tests; here the
  subject is the stream runtime plumbing),
* the SAME noise stream: our pipeline runs untouched (its jax PRNG draws
  are deterministic), and the torch side's torch.randn/randn_like are
  replayed from the precomputed jax noise sequence,
* a shimmed diffusers-0.25.0 LCMScheduler (tests/refshim) as the torch-side
  oracle for the schedule math in live2diff_tpu/schedule.py.

Asserts per-frame output parity (<1e-3 rel, fp32) over 20 streamed frames —
through warmup, buffer lag, window fill AND eviction (window 16 / sink 8:
eviction begins at frame ~7) — and with the ``do_add_noise=False`` toggle.
"""

from __future__ import annotations

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from refshim import (  # noqa: E402
    load_reference_models,
    load_reference_stream_pipeline,
    reference_available,
)

if not reference_available():  # pragma: no cover
    pytest.skip("/root/reference not present", allow_module_level=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from live2diff_tpu.convert.torch_to_flax import unet_torch_to_flax  # noqa: E402
from live2diff_tpu.models.unet import UNet3DConditionModel, UNetConfig  # noqa: E402
from live2diff_tpu.schedule import LCMSchedule  # noqa: E402
from live2diff_tpu.stream.pipeline import StreamConfig, StreamDiffusionDepth  # noqa: E402

# geometry: 128x128 pixels, /8 micro VAE -> 16x16 latents (the mid block then
# runs at 2x2 spatial — at 1x1 its tiny-group GroupNorms divide by ~sqrt(eps)
# and amplify fp32 noise ~300x/layer, making parity ill-conditioned);
# REAL window/sink (16/8)
H = W = 128
LH = LW = 16
CH = (32, 32, 64, 64)
STEPS = 2
T_INDEX = [30, 40]
N_INFER = 50
WINDOW, SINK = 16, 8
PROMPT_LEN, CROSS_DIM = 7, 16
WARM = 8
SCALING = 0.18215
DEPTH_W = np.asarray([0.25, 0.6, 0.15], np.float32)

MM_KW = dict(
    num_attention_heads=2,
    num_transformer_block=1,
    attention_block_types=["Temporal_Self", "Temporal_Self"],
    temporal_position_encoding=True,
    temporal_position_encoding_max_len=24,
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


def rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-8))


# ---------------------------------------------------------------------------
# shared micro VAE + depth model, einsum-mirrored in torch and jax
# ---------------------------------------------------------------------------


def make_micro_vae_weights():
    rs = np.random.RandomState(17)
    return dict(
        enc_k=(0.05 * rs.randn(8, 8, 3, 4)).astype(np.float32),  # [a,b,c,i]
        enc_b=(0.01 * rs.randn(4)).astype(np.float32),
        dec_k=(0.05 * rs.randn(4, 8, 8, 3)).astype(np.float32),  # [c,a,b,o]
        dec_b=(0.01 * rs.randn(3)).astype(np.float32),
    )


def jax_vae_encode(params, x):
    """[F, H, W, 3] -> [F, h, w, 4]: non-overlapping 8x8 patch projection."""
    f, hh, ww, _ = x.shape
    xp = x.reshape(f, hh // 8, 8, ww // 8, 8, 3)
    return jnp.einsum("fhawbc,abci->fhwi", xp, params["enc_k"]) + params["enc_b"]


def jax_vae_decode(params, z):
    """[F, h, w, 4] -> [F, H, W, 3]: tanh bottleneck + patch expansion."""
    f, h, w, _ = z.shape
    t = jnp.tanh(z)
    y = jnp.einsum("fhwc,cabo->fhawbo", t, params["dec_k"])
    return y.reshape(f, h * 8, w * 8, 3) + params["dec_b"]


class TorchMicroVAE(nn.Module):
    class _EncOut:
        def __init__(self, latents):
            self.latents = latents

    def __init__(self, wts):
        super().__init__()
        for k, v in wts.items():
            self.register_buffer(k, torch.from_numpy(v))
        self.config = SimpleNamespace(scaling_factor=SCALING)

    @property
    def dtype(self):
        return torch.float32

    def encode(self, x):  # [f, 3, H, W]
        f, _, hh, ww = x.shape
        xp = x.reshape(f, 3, hh // 8, 8, ww // 8, 8)
        z = torch.einsum("fchawb,abci->fihw", xp, self.enc_k)
        return self._EncOut(z + self.enc_b[None, :, None, None])

    def decode(self, z, return_dict=False):  # [f, 4, h, w]
        f, _, h, w = z.shape
        t = torch.tanh(z)
        y = torch.einsum("fchw,cabo->fohawb", t, self.dec_k)
        y = y.reshape(f, 3, h * 8, w * 8) + self.dec_b[None, :, None, None]
        return (y,)


def jax_depth_fn(params, x):  # [F, 384, 384, 3] -> [F, 384, 384]
    del params
    return jnp.einsum("fhwc,c->fhw", x, jnp.asarray(DEPTH_W))


class TorchDepth(nn.Module):
    def __init__(self):
        super().__init__()
        self.register_buffer("w", torch.from_numpy(DEPTH_W))

    @property
    def dtype(self):
        return torch.float32

    def forward(self, x):  # [f, 3, 384, 384]
        return torch.einsum("fchw,c->fhw", x, self.w)


# ---------------------------------------------------------------------------
# noise replay: precompute OUR pipeline's deterministic jax noise sequence
# and feed it to the torch side's randn/randn_like
# ---------------------------------------------------------------------------


def compute_noise_plan(seed, n_frames):
    """Replicates StreamDiffusionDepth's PRNG evolution on host."""
    rng = jax.random.PRNGKey(seed)
    plan = {"warm_enc": [], "warm_loop": [], "enc": [], "buf": []}
    # _warmup_denoise: split 2-way, encode noise over 8 warmup latents
    rng, r_enc = jax.random.split(rng)
    plan["warm_enc"].append(
        np.asarray(jax.random.normal(r_enc, (WARM, LH, LW, 4), jnp.float32)))
    for _ in range(STEPS - 1):
        rng, r = jax.random.split(rng)
        plan["warm_loop"].append(
            np.asarray(jax.random.normal(r, (WARM, LH, LW, 4), jnp.float32)))
    # _frame_step: split 3-way per frame
    for _ in range(n_frames):
        rng, r_enc, r_buf = jax.random.split(rng, 3)
        plan["enc"].append(
            np.asarray(jax.random.normal(r_enc, (1, LH, LW, 4), jnp.float32)))
        plan["buf"].append(
            np.asarray(jax.random.normal(r_buf, (STEPS - 1, LH, LW, 4), jnp.float32)))
    return plan


class NoiseReplay:
    """Dispatch torch.randn/randn_like by shape to the precomputed jax draws
    (layout-mapped [.., h, w, c] -> [.., c, h, w])."""

    def __init__(self, plan):
        self.plan = {k: list(v) for k, v in plan.items()}

    def __call__(self, *shape, **kwargs):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list, torch.Size)):
            shape = tuple(shape[0])
        shape = tuple(int(s) for s in shape)
        if shape == (WARM, 4, LH, LW):  # warmup encode noise
            arr = self.plan["warm_enc"].pop(0).transpose(0, 3, 1, 2)
        elif shape == (1, 4, WARM, LH, LW):  # warmup loop re-noising
            arr = self.plan["warm_loop"].pop(0).transpose(3, 0, 1, 2)[None]
        elif shape == (STEPS, 4, WARM, LH, LW):  # init_noise: unused w/ cfg none
            arr = np.zeros(shape, np.float32)
        elif shape == (1, 4, LH, LW):  # frame encode noise
            arr = self.plan["enc"].pop(0).transpose(0, 3, 1, 2)
        elif shape == (STEPS - 1, 4, 1, LH, LW):  # buffer re-noising
            arr = self.plan["buf"].pop(0).transpose(0, 3, 1, 2)[:, :, None]
        else:  # pragma: no cover
            raise AssertionError(f"unexpected torch.randn shape {shape}")
        return torch.from_numpy(np.ascontiguousarray(arr))

    def randn_like(self, t, **kwargs):
        return self(*t.shape)


# ---------------------------------------------------------------------------
# torch-side assembly: FakePipe + CPU patches
# ---------------------------------------------------------------------------


class FakePipe:
    """Duck-typed AnimationDepthPipeline carrying refanim-built models."""

    def __init__(self, unet_stream, unet_warmup, vae, depth, prompt_embeds):
        self.device = torch.device("cpu")
        self.vae_scale_factor = 8
        self.scheduler = SimpleNamespace(config=dict(
            num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
            beta_schedule="linear",
        ))
        self.unet = unet_stream
        self._unet_warmup = unet_warmup
        self.vae = vae
        self.text_encoder = None
        self.depth_model = depth
        self._prompt_embeds = prompt_embeds

    def _encode_prompt(self, **kwargs):
        return (self._prompt_embeds,)

    # mirrors AnimationDepthPipeline.prepare_cache/prepare_warmup_unet
    # (pipeline_animatediff_depth.py:341-351)
    def prepare_cache(self, height, width, denoising_steps_num):
        self.unet.set_info_for_attn(height // 8, width // 8)
        return self.unet.prepare_cache(denoising_steps_num)

    def prepare_warmup_unet(self, height, width, unet):
        unet.set_info_for_attn(height // 8, width // 8)

    def build_warmup_unet(self, config):
        return self._unet_warmup


@pytest.fixture()
def cpu_patches(monkeypatch):
    """Neutralise the reference's hard .cuda() calls for CPU execution."""

    class _Event:
        def __init__(self, enable_timing=False):
            pass

        def record(self):
            pass

        def elapsed_time(self, other):
            return 0.0

    monkeypatch.setattr(torch.cuda, "Event", _Event)
    monkeypatch.setattr(torch.cuda, "synchronize", lambda *a, **k: None)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False)

    orig_to = nn.Module.to

    def safe_to(self, *args, **kwargs):
        args = tuple(
            a for a in args
            if not (isinstance(a, (str, torch.device)) and "cuda" in str(a))
        )
        if "cuda" in str(kwargs.get("device", "")):
            kwargs.pop("device")
        return orig_to(self, *args, **kwargs)

    monkeypatch.setattr(nn.Module, "to", safe_to)


@pytest.fixture(scope="module")
def shared_models():
    mods = load_reference_models()
    torch.manual_seed(7)
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
    with torch.no_grad():
        for name, p in us.named_parameters():
            if "proj_out" in name and "motion_modules" in name:
                p.add_(0.02 * torch.randn_like(p))
    missing, unexpected = uw.load_state_dict(us.state_dict(), strict=False)
    assert not missing and not unexpected
    us.eval(), uw.eval()

    sd = {k: v.detach().numpy() for k, v in us.state_dict().items()}
    params, skipped = unet_torch_to_flax(sd)
    assert all(k.endswith("pos_encoder.pe") for k in skipped), skipped
    cfg = UNetConfig(
        block_out_channels=CH, attention_head_dim=2,
        cross_attention_dim=CROSS_DIM, norm_num_groups=32,
        motion_num_attention_heads=2, motion_pe_max_len=24,
        window_size=WINDOW, sink_size=SINK,
    )
    unet = UNet3DConditionModel(config=cfg, dtype=jnp.float32, param_dtype=jnp.float32)

    vae_wts = make_micro_vae_weights()
    prompt = np.random.RandomState(23).randn(1, PROMPT_LEN, CROSS_DIM).astype(np.float32)
    return us, uw, unet, params, vae_wts, prompt


def _build_ours(shared_models, do_add_noise):
    _, _, unet, params, vae_wts, _ = shared_models
    sched = LCMSchedule.create(N_INFER, t_index_list=T_INDEX)
    scfg = StreamConfig(
        height=H, width=W, do_add_noise=do_add_noise, vae_scaling=SCALING,
        cache_dtype=jnp.float32, output_uint8=False,
    )
    vparams = {k: jnp.asarray(v) for k, v in vae_wts.items()}
    return StreamDiffusionDepth(
        unet, params, sched, scfg, jax_vae_encode, jax_vae_decode,
        depth_fn=jax_depth_fn, vae_params=vparams, depth_params={},
    )


def _build_ref(shared_models, do_add_noise):
    us, uw, _, _, vae_wts, prompt = shared_models
    stream_mod = load_reference_stream_pipeline()
    pipe = FakePipe(us, uw, TorchMicroVAE(vae_wts), TorchDepth(),
                    torch.from_numpy(prompt))
    ref = stream_mod.StreamAnimateDiffusionDepth(
        pipe, num_inference_steps=N_INFER, t_index_list=list(T_INDEX),
        torch_dtype=torch.float32, width=W, height=H,
        do_add_noise=do_add_noise, use_denoising_batch=True,
        frame_buffer_size=1, cfg_type="none",
    )
    ref.load_warmup_unet(config=None)
    ref.prepare_cache(height=H, width=W, denoising_steps_num=STEPS)
    return ref


def _run_pair(shared_models, monkeypatch, do_add_noise, n_frames, seed=5):
    """Run both pipelines on identical frames + noise; return output lists."""
    _, _, _, _, _, prompt = shared_models
    frame_rng = np.random.RandomState(99)
    # slowly-varying stream so caches matter: base + drift + per-frame detail
    base = frame_rng.rand(H, W, 3).astype(np.float32)
    frames01 = []
    for i in range(WARM + n_frames):
        drift = 0.1 * np.sin(0.3 * i + np.linspace(0, 3, H))[:, None, None]
        detail = 0.05 * frame_rng.rand(H, W, 3).astype(np.float32)
        frames01.append(np.clip(base + drift + detail, 0.0, 1.0).astype(np.float32))

    # Both runtimes start frame 0 with ZERO latent/depth buffers (reference
    # design); a zero row reaches GroupNorm as a constant field, where
    # (x - mean) / sqrt(0 + eps) amplifies impl-specific fp32 rounding ~300x
    # per layer — the reference's own first n-1 outputs are discarded-by-
    # design garbage (test.py lag handling). Seeding BOTH buffers with the
    # same noise keeps every compared frame well-conditioned without
    # touching either runtime.
    import dataclasses

    buf_rng = np.random.RandomState(1234)
    xbuf = (0.3 * buf_rng.randn(STEPS - 1, LH, LW, 4)).astype(np.float32)
    dbuf = (0.3 * buf_rng.randn(STEPS - 1, LH, LW, 4)).astype(np.float32)

    # ---- ours (production path, untouched PRNG) ----
    ours = _build_ours(shared_models, do_add_noise)
    warm_ours = np.stack([f * 2.0 - 1.0 for f in frames01[:WARM]])
    state, warm_out = ours.prepare(warm_ours, jnp.asarray(prompt), seed=seed)
    state = dataclasses.replace(
        state, x_t_buffer=jnp.asarray(xbuf), depth_buffer=jnp.asarray(dbuf))
    our_frames = []
    for f01 in frames01[WARM:]:
        state, out = ours(state, f01 * 2.0 - 1.0)
        our_frames.append(np.asarray(out))

    # ---- reference, replaying our noise ----
    replay = NoiseReplay(compute_noise_plan(seed, n_frames))
    monkeypatch.setattr(torch, "randn", replay)
    monkeypatch.setattr(torch, "randn_like", replay.randn_like)
    ref = _build_ref(shared_models, do_add_noise)
    warm_t = [torch.from_numpy(f.transpose(2, 0, 1)) for f in frames01[:WARM]]
    with torch.no_grad():
        ref_warm = ref.prepare(warm_t, prompt="unused", seed=seed).numpy()
        ref.x_t_latent_buffer = torch.from_numpy(
            xbuf.transpose(0, 3, 1, 2)[:, :, None].copy())
        ref.depth_latent_buffer = torch.from_numpy(
            dbuf.transpose(0, 3, 1, 2)[:, :, None].copy())
        ref_frames = []
        for f01 in frames01[WARM:]:
            out = ref(torch.from_numpy(f01.transpose(2, 0, 1)))
            ref_frames.append(out.numpy())

    return warm_out, ref_warm, our_frames, ref_frames


def test_full_stream_parity_20_frames(shared_models, cpu_patches, monkeypatch):
    warm_out, ref_warm, our_frames, ref_frames = _run_pair(
        shared_models, monkeypatch, do_add_noise=True, n_frames=20
    )
    err = rel_err(warm_out, ref_warm.transpose(0, 2, 3, 1))
    assert err < 1e-3, f"warmup output: rel err {err:.2e}"
    for i, (ours, ref) in enumerate(zip(our_frames, ref_frames)):
        err = rel_err(ours, ref[0].transpose(1, 2, 0))
        assert err < 1e-3, f"frame {i}: rel err {err:.2e}"


def test_full_stream_parity_no_add_noise(shared_models, cpu_patches, monkeypatch):
    _, _, our_frames, ref_frames = _run_pair(
        shared_models, monkeypatch, do_add_noise=False, n_frames=6
    )
    for i, (ours, ref) in enumerate(zip(our_frames, ref_frames)):
        err = rel_err(ours, ref[0].transpose(1, 2, 0))
        assert err < 1e-3, f"frame {i} (do_add_noise=False): rel err {err:.2e}"
