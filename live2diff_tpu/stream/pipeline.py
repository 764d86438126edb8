"""StreamDiffusionDepth: the jit-compiled per-frame stream runtime.

TPU-native redesign of the reference's ``StreamAnimateDiffusionDepth``
(/root/reference/live2diff/pipeline_stream_animation_depth.py:24-666). The
reference dispatches VAE encode, MiDaS, a UNet TensorRT engine, mask
bookkeeping on host, an LCM step, and VAE decode as separate calls per
frame; here the whole per-frame computation is ONE compiled XLA program:

    frame_step: (params, StreamState, frame_rgb) -> (StreamState, frame_rgb_out)

with the StreamState donated, so KV-caches and latent buffers update
in-place in HBM. Warmup (``prepare``) is a second compiled program sharing
the same weights.

Stream-batch semantics (StreamDiffusion): the UNet batch axis carries the
``n`` denoising steps of ``n`` consecutive frames — the incoming frame at
the noisiest timestep plus the n-1 buffered intermediate latents — so each
frame costs exactly one UNet call; outputs lag input by n-1 frames.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.unet import UNet3DConditionModel, UNetConfig
from ..schedule import LCMSchedule
from .state import StreamState
from .state_machine import init_window_state, mask_to_bias, update_window_state


def _restore_formats(tree, canonical_formats):
    """Force every array leaf of ``tree`` back into its canonical layout.

    The compile service chooses executable output layouts nondeterministically
    (a fresh compile and a cache-deserialize of the same program can disagree).
    The warmup program's output state is the frame-step program's input, and
    jit bakes input layouts into the module, so a drifted layout here changes
    ``_frame_step``'s persistent-cache key — one step's layout drift poisons
    the next run's warm start. Canonical = the layouts ``init_state`` produces
    (always-fresh sub-second compiles, deterministic per platform version).
    ``jax.device_put`` with an explicit Format relayouts on-device (verified
    honored on this backend); leaves already in canonical layout pass through
    untouched."""

    def fix(leaf, fmt):
        if fmt is None or not hasattr(leaf, "format"):
            return leaf
        if leaf.format == fmt:
            return leaf
        return jax.device_put(leaf, fmt)

    # canonical_formats is a flat list (tree_flatten order) so None
    # placeholders for non-Array leaves stay leaves instead of becoming
    # empty subtrees under tree.map
    leaves, treedef = jax.tree.flatten(tree)
    fixed = [fix(leaf, fmt) for leaf, fmt in zip(leaves, canonical_formats)]
    return jax.tree.unflatten(treedef, fixed)


@dataclasses.dataclass
class StreamConfig:
    height: int = 512
    width: int = 512
    do_add_noise: bool = True
    # NOTE: stream-batch denoising is always on and cfg is always "none" —
    # the only mode the reference supports for this pipeline
    # (pipeline_stream_animation_depth.py restricts cfg_type to "none"); no
    # flags are exposed for modes the step function would silently ignore.
    # (clip_skip lives on BuiltPipeline: prompt encoding is outside the step.)
    vae_scale_factor: int = 8
    vae_scaling: float = 0.18215
    cache_dtype: Any = jnp.bfloat16
    # emit frames as uint8 [0,255] on-device: the serving/bench path JPEG-
    # encodes or displays uint8 anyway, and the device->host download is 4x
    # smaller (3 MB -> 0.75 MB per 512x512 frame — material over a tunnel)
    output_uint8: bool = False

    @property
    def latent_height(self) -> int:
        return self.height // self.vae_scale_factor

    @property
    def latent_width(self) -> int:
        return self.width // self.vae_scale_factor


class StreamDiffusionDepth:
    """Orchestrates UNet / VAE / depth submodels into compiled stream programs.

    The submodels are injected as (apply_fn, params) pairs so the runtime is
    agnostic to full-KL vs TinyVAE, real MiDaS vs none, etc. All apply fns
    are jax-traceable; nothing here leaves the device in the hot loop.
    """

    def __init__(
        self,
        unet: UNet3DConditionModel,
        unet_params,
        schedule: LCMSchedule,
        stream_config: StreamConfig,
        vae_encode: Callable[[Any, jnp.ndarray], jnp.ndarray],
        vae_decode: Callable[[Any, jnp.ndarray], jnp.ndarray],
        depth_fn: Optional[Callable[[Any, jnp.ndarray], jnp.ndarray]] = None,
        vae_params: Any = None,
        depth_params: Any = None,
    ):
        """vae_encode/vae_decode/depth_fn take (params, x): weights flow
        through jit as ARGUMENTS, never as captured constants — capturing
        them would bake ~GBs of weights into the lowered program."""
        self.unet = unet
        self.schedule = schedule
        self.cfg = stream_config
        self.vae_encode = vae_encode
        self.vae_decode = vae_decode
        self.depth_fn = depth_fn
        # one param bundle threaded through both compiled programs
        self.params = {"unet": unet_params, "vae": vae_params, "depth": depth_params}

        n = schedule.num_steps
        self.num_steps = n
        # per-step scalars, shaped for broadcasting over [n, h, w, c].
        # Kept as NUMPY so they lower as inline literals: a device array
        # captured as a jit constant forces a device->host fetch of its
        # value at LOWERING time — over a remote-device transport each such
        # fetch costs a full sync (measured ~49 s/constant on the axon
        # tunnel, ~245 s of the round-2 cold start).
        self.c_skip = np.asarray(schedule.c_skip, np.float32)[:, None, None, None]
        self.c_out = np.asarray(schedule.c_out, np.float32)[:, None, None, None]
        self.alpha = np.asarray(schedule.alpha_prod_sqrt, np.float32)[:, None, None, None]
        self.beta = np.asarray(schedule.beta_prod_sqrt, np.float32)[:, None, None, None]
        self.sub_timesteps = np.asarray(schedule.sub_timesteps, np.int32)

        self._prompt_embeds: Optional[jnp.ndarray] = None
        # NOTE: no jit-level layout pins here. The compile service honors
        # entry layouts nondeterministically, which poisons the executable
        # cache with mixed-layout programs. Instead the Pallas stream kernel
        # consumes the cache through a swapaxes view whose required layout
        # coincides with XLA's preferred one (see ops/stream_attention.py).
        self._jit_step = jax.jit(self._frame_step, donate_argnums=(1,))
        # donate the freshly-initialised state: warmup fills the caches in
        # place instead of holding init + filled copies (2x ~3 GB) at once
        self._jit_prepare = jax.jit(self._warmup_denoise, donate_argnums=(1,))
        # burst mode: N frames scanned inside ONE compiled program (the
        # reference test.py's offline loop as a single dispatch); compiled
        # lazily on first stream_burst() call
        self._jit_burst = jax.jit(self._burst_steps, donate_argnums=(1,))

    # ------------------------------------------------------------------
    # state creation
    # ------------------------------------------------------------------

    def init_state(self, seed: int = 2) -> StreamState:
        cfg, n = self.cfg, self.num_steps
        lh, lw = cfg.latent_height, cfg.latent_width
        caches = self.unet.config.init_caches(lh, lw, n, dtype=cfg.cache_dtype)
        mask, pe_idx, update_idx = init_window_state(
            n, self.unet.config.window_size, self.unet.config.sink_size
        )
        buf_shape = (max(n - 1, 0), lh, lw, 4)
        return StreamState(
            rng=jax.random.PRNGKey(seed),
            attn_mask=mask,
            pe_idx=pe_idx,
            update_idx=update_idx,
            kv_caches=caches,
            x_t_buffer=jnp.zeros(buf_shape, jnp.float32),
            depth_buffer=jnp.zeros(buf_shape, jnp.float32),
        )

    def set_prompt(self, prompt_embeds: jnp.ndarray) -> None:
        """[77, 768] or [1, 77, 768] text embedding; broadcast to the batch.

        The embedding is round-tripped through HOST memory deliberately: it
        usually arrives as the output of the compiled text-encoder program,
        and this platform's compile service picks executable OUTPUT layouts
        nondeterministically (fresh compile vs cache-deserialize can differ).
        jit bakes argument layouts into the lowered module, so feeding a
        variable-layout array into ``_frame_step``/``_warmup_denoise`` gives
        the big programs a different persistent-cache key on every run —
        measured root cause of the round-2 "warm cache never hits" cold
        starts. A host round-trip costs ~1 ms for [n, 77, 768] and pins the
        canonical host layout."""
        if prompt_embeds.ndim == 2:
            prompt_embeds = prompt_embeds[None]
        embeds = np.broadcast_to(
            np.asarray(prompt_embeds), (self.num_steps, *prompt_embeds.shape[1:])
        )
        self._prompt_embeds = jnp.asarray(embeds)

    # ------------------------------------------------------------------
    # latent codecs (traced into both compiled programs)
    # ------------------------------------------------------------------

    def _encode_image(self, params, rng, frames_rgb: jnp.ndarray) -> jnp.ndarray:
        """[F, H, W, 3] in [-1, 1] -> noised latents [F, h, w, 4] at t0."""
        latents = self.vae_encode(params["vae"], frames_rgb) * self.cfg.vae_scaling
        noise = jax.random.normal(rng, latents.shape, dtype=latents.dtype)
        return self.alpha[0] * latents + self.beta[0] * noise

    def _depth_image(self, params, frames_rgb: jnp.ndarray) -> jnp.ndarray:
        """[F, H, W, 3] -> 3-channel depth image in [-1, 1].

        MiDaS at 384x384 -> min-max normalise over the batch -> 3-channel
        [-1,1] image (reference encode_depth,
        pipeline_stream_animation_depth.py:544-571).
        """
        f, H, W, _ = frames_rgb.shape
        # antialias=False matches the reference's F.interpolate(bilinear,
        # align_corners=False) on the 512->384 downscale — jax's default
        # antialias=True filters downsamples and diverges from the reference
        depth_in = jax.image.resize(
            frames_rgb, (f, 384, 384, 3), "bilinear", antialias=False
        )
        depth = self.depth_fn(params["depth"], depth_in)  # [F, 384, 384]
        dmin, dmax = depth.min(), depth.max()
        depth = (depth - dmin) / (dmax - dmin + 1e-6)
        depth3 = jnp.repeat(depth[..., None], 3, axis=-1) * 2.0 - 1.0
        return jax.image.resize(depth3, (f, H, W, 3), "bilinear", antialias=False)

    def _encode_depth(self, params, frames_rgb: jnp.ndarray) -> jnp.ndarray:
        """[F, H, W, 3] -> depth-conditioned latents [F, h, w, 4]."""
        if self.depth_fn is None:
            return jnp.zeros(
                (frames_rgb.shape[0], self.cfg.latent_height, self.cfg.latent_width, 4),
                frames_rgb.dtype,
            )
        depth3 = self._depth_image(params, frames_rgb)
        return self.vae_encode(params["vae"], depth3) * self.cfg.vae_scaling

    def _encode_frame_and_depth(self, params, rng, frames_rgb: jnp.ndarray):
        """One BATCHED VAE encode for the frame and its depth image.

        Batch-1 convs at full resolution are the worst MXU shape on TPU;
        encoding ``concat([frames, depth3])`` in a single call halves the
        per-call weight-load overhead vs the reference's two separate encodes
        (pipeline_stream_animation_depth.py:517-571). Returns
        ``(x_t noised at t0, depth latents)``.
        """
        if self.depth_fn is None:
            return (
                self._encode_image(params, rng, frames_rgb),
                jnp.zeros(
                    (frames_rgb.shape[0], self.cfg.latent_height,
                     self.cfg.latent_width, 4),
                    frames_rgb.dtype,
                ),
            )
        f = frames_rgb.shape[0]
        depth3 = self._depth_image(params, frames_rgb)
        both = jnp.concatenate([frames_rgb, depth3], axis=0)
        lat = self.vae_encode(params["vae"], both) * self.cfg.vae_scaling
        latents, depth_lat = lat[:f], lat[f:]
        noise = jax.random.normal(rng, latents.shape, dtype=latents.dtype)
        return self.alpha[0] * latents + self.beta[0] * noise, depth_lat

    def _decode_latents(self, params, x0: jnp.ndarray) -> jnp.ndarray:
        img = self.vae_decode(params["vae"], x0 / self.cfg.vae_scaling)
        img = jnp.clip(img, -1.0, 1.0)
        if self.cfg.output_uint8:
            img = jnp.round((img + 1.0) * 127.5).astype(jnp.uint8)
        return img

    # ------------------------------------------------------------------
    # LCM consistency step
    # ------------------------------------------------------------------

    def _scheduler_step_batch(self, model_pred, x_t):
        """Batched LCM x0-prediction: F_theta = (x - beta*eps)/alpha;
        x0 = c_out * F_theta + c_skip * x."""
        f_theta = (x_t - self.beta * model_pred) / self.alpha
        return self.c_out * f_theta + self.c_skip * x_t

    # ------------------------------------------------------------------
    # compiled programs
    # ------------------------------------------------------------------

    def _unet_apply(self, params, x_t, depth, state: StreamState, prompt_embeds):
        sample = x_t[:, None].astype(self.unet.dtype)  # [n, 1, h, w, 4]
        depth5 = depth[:, None].astype(self.unet.dtype)
        bias = mask_to_bias(state.attn_mask, dtype=jnp.float32)
        out, new_caches = self.unet.apply(
            params["unet"],
            sample,
            self.sub_timesteps,
            prompt_embeds.astype(self.unet.dtype),
            depth5,
            state.kv_caches,
            "stream",
            bias,
            state.pe_idx,
            state.update_idx,
        )
        return out[:, 0].astype(jnp.float32), new_caches

    def _frame_step(
        self, params, state: StreamState, frame_rgb: jnp.ndarray,
        prompt_embeds: jnp.ndarray,
    ) -> Tuple[StreamState, jnp.ndarray]:
        """One streamed frame: encode -> stream-batch UNet -> LCM -> decode."""
        cfg, n = self.cfg, self.num_steps
        if frame_rgb.dtype == jnp.uint8:
            # device-side preprocess: uint8 frames are 4x cheaper to upload
            frame_rgb = frame_rgb.astype(jnp.float32) / 127.5 - 1.0
        rng, r_enc, r_buf = jax.random.split(state.rng, 3)

        x_t_new, depth_new = self._encode_frame_and_depth(
            params, r_enc, frame_rgb[None]
        )  # [1, h, w, 4] each

        if n > 1:
            x_t = jnp.concatenate([x_t_new, state.x_t_buffer], axis=0)
            depth = jnp.concatenate([depth_new, state.depth_buffer], axis=0)
        else:
            x_t, depth = x_t_new, depth_new

        model_pred, new_caches = self._unet_apply(params, x_t, depth, state, prompt_embeds)
        x0_batch = self._scheduler_step_batch(model_pred, x_t)

        mask, pe_idx, update_idx = update_window_state(
            state.attn_mask, state.pe_idx, state.update_idx, self.unet.config.sink_size
        )

        if n > 1:
            x0_out = x0_batch[-1]
            if cfg.do_add_noise:
                noise = jax.random.normal(r_buf, x0_batch[:-1].shape, x0_batch.dtype)
                x_t_buffer = self.alpha[1:] * x0_batch[:-1] + self.beta[1:] * noise
            else:
                x_t_buffer = self.alpha[1:] * x0_batch[:-1]
            depth_buffer = depth[:-1]
        else:
            x0_out = x0_batch[0]
            x_t_buffer = state.x_t_buffer
            depth_buffer = state.depth_buffer

        out_rgb = self._decode_latents(params, x0_out[None])[0]

        new_state = StreamState(
            rng=rng,
            attn_mask=mask,
            pe_idx=pe_idx,
            update_idx=update_idx,
            kv_caches=new_caches,
            x_t_buffer=x_t_buffer,
            depth_buffer=depth_buffer,
            frame_idx=state.frame_idx + 1,
        )
        return new_state, out_rgb

    def _warmup_denoise(
        self, params, state: StreamState, warmup_rgb: jnp.ndarray,
        prompt_embeds: jnp.ndarray,
    ) -> Tuple[StreamState, jnp.ndarray]:
        """Warmup program: encode the 8 warmup frames, run the denoise loop
        with bidirectional temporal attention, filling every step's cache.

        Mirrors the reference warmup (pipeline_stream_animation_depth.py:302-344)
        but as one compiled program; the python loop over denoise steps
        unrolls at trace time (n is 2..4).
        """
        rng, r_enc = jax.random.split(state.rng)
        x_t, depth = self._encode_frame_and_depth(params, r_enc, warmup_rgb)

        caches = state.kv_caches
        sample = x_t[None].astype(self.unet.dtype)  # [1, F, h, w, 4]
        depth5 = depth[None].astype(self.unet.dtype)
        prompt1 = prompt_embeds[:1].astype(self.unet.dtype)

        x0 = None
        for idx in range(self.num_steps):
            t = self.sub_timesteps[idx][None]
            out, caches = self.unet.apply(
                params["unet"], sample, t, prompt1, depth5, caches,
                "warmup", None, None, None, idx,
            )
            model_pred = out[0].astype(jnp.float32)  # [F, h, w, 4]
            x_cur = sample[0].astype(jnp.float32)
            f_theta = (x_cur - self.beta[idx] * model_pred) / self.alpha[idx]
            x0 = self.c_out[idx] * f_theta + self.c_skip[idx] * x_cur
            if idx < self.num_steps - 1:
                rng, r = jax.random.split(rng)
                noise = jax.random.normal(r, x0.shape, x0.dtype)
                sample = (self.alpha[idx + 1] * x0 + self.beta[idx + 1] * noise)[None].astype(
                    self.unet.dtype
                )

        out_rgb = self._decode_latents(params, x0)

        new_state = dataclasses.replace(
            state, rng=rng, kv_caches=tuple(caches)
        )
        return new_state, out_rgb

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def prepare(
        self, warmup_frames: np.ndarray, prompt_embeds: jnp.ndarray, seed: int = 2
    ) -> Tuple[StreamState, np.ndarray]:
        """warmup_frames: [8, H, W, 3] float32 in [-1, 1]."""
        self.set_prompt(prompt_embeds)
        state = self.init_state(seed)
        canonical = [getattr(leaf, "format", None)
                     for leaf in jax.tree.leaves(state)]
        state, out = self._jit_prepare(
            self.params, state, jnp.asarray(warmup_frames), self._prompt_embeds
        )
        state = _restore_formats(state, canonical)
        return state, np.asarray(out)

    def _burst_steps(
        self, params, state: StreamState, frames_rgb: jnp.ndarray,
        prompt_embeds: jnp.ndarray,
    ) -> Tuple[StreamState, jnp.ndarray]:
        """lax.scan of _frame_step over a frame burst: one dispatch for N
        frames — identical math to N __call__s (the scan body IS
        _frame_step), with per-dispatch host/RPC cost amortised away."""

        def body(st, frame):
            return self._frame_step(params, st, frame, prompt_embeds)

        return jax.lax.scan(body, state, frames_rgb)

    def stream_burst(
        self, state: StreamState, frames: np.ndarray
    ) -> Tuple[StreamState, jnp.ndarray]:
        """frames: [N, H, W, 3] -> (state, [N, H, W, 3] outputs on device).

        Offline/segment mode (the reference's test.py per-frame loop,
        test.py:170-173, as one compiled program). Streaming latency
        semantics are unchanged — outputs still lag by num_steps-1 frames —
        but a burst requires its N input frames up front, so this is for
        vid2vid/segment processing, not camera serving.
        """
        if self._prompt_embeds is None:
            raise RuntimeError("call prepare() first")
        return self._jit_burst(
            self.params, state, jnp.asarray(frames), self._prompt_embeds
        )

    def warm_frame_step(self, frame_dtype=jnp.float32) -> float:
        """Compile + execute one dummy frame step; returns wall seconds.

        The reference pre-warms its engines with dummy runs inside prepare
        (pipeline_stream_animation_depth.py:346-366); without this the first
        user frame pays the full XLA compile (~2 min over a tunneled chip).
        A throwaway ``init_state()`` is stepped and discarded: fresh init
        states carry the canonical layouts (_restore_formats' target), so
        the compiled program is exactly the one real frames will hit, and
        donation consumes only the throwaway buffers.
        """
        if self._prompt_embeds is None:
            raise RuntimeError("set_prompt()/prepare() before warm_frame_step()")
        t0 = time.perf_counter()
        dummy_state = self.init_state(seed=0)
        dummy = jnp.zeros((self.cfg.height, self.cfg.width, 3), frame_dtype)
        out = self._jit_step(self.params, dummy_state, dummy, self._prompt_embeds)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    def __call__(
        self, state: StreamState, frame: np.ndarray
    ) -> Tuple[StreamState, jnp.ndarray]:
        """frame: [H, W, 3] in [-1, 1]. Returns (state, output frame on device)."""
        if self._prompt_embeds is None:
            raise RuntimeError("call prepare() first")
        return self._jit_step(self.params, state, jnp.asarray(frame), self._prompt_embeds)
