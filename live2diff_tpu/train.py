"""Motion-module trainer driver: clips -> latents -> (dp, tp) train step.

The reference ships no training code (SURVEY §4) — its motion modules were
trained AnimateDiff-style offline. Round 4 left the training subsystem a
"missing middle": `parallel/train.py` consumed `batch["latents"]` but
nothing VAE-encoded clips, encoded captions, or ran the loop. This module
is that driver:

  ClipDataset [B,F,H,W,3]  --jit VAE encode (dp-sharded)-->  latents
  caption     --CLIP text encoder (or fixed embedding)-->    text embeds
  make_train_step on a (dp, tp) Mesh  --orbax-->             save/resume

Everything on-device is jitted: one program VAE-encodes the clip batch
(frames folded into the batch axis so the conv encoder sees a single big
batch — MXU-friendly), one program runs fused forward+backward+AdamW.

Usage:
  python -m live2diff_tpu.train --tiny                # synthetic smoke
  python -m live2diff_tpu.train --data DIR --caption "..." --steps 10000

Without trained SD weights on disk (this environment) params are randomly
initialised; point --sd-checkpoint at an ingested checkpoint directory to
train against real weights (convert/ldm.py, convert/torch_to_flax.py).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

# NOTE: jax is imported lazily inside Trainer so `--tiny` can pin the cpu
# platform BEFORE the first backend init (see main()); jnp alone is safe.
import jax.numpy as jnp

__all__ = ["TrainerConfig", "Trainer", "synthetic_clips", "main"]


@dataclass
class TrainerConfig:
    data: Optional[str] = None          # video root; None => synthetic
    caption: str = "a video clip"
    steps: int = 30
    batch: int = 2
    clip_len: int = 4
    height: int = 64
    width: int = 64
    lr: float = 1e-4
    weight_decay: float = 0.01
    ckpt_dir: Optional[str] = None
    save_every: int = 100
    log_every: int = 10
    resume: bool = False
    tiny: bool = False
    seed: int = 0
    use_depth: bool = False
    sd_checkpoint: Optional[str] = None  # ingested weights (optional)


def synthetic_clips(cfg: TrainerConfig) -> Iterator[np.ndarray]:
    """One deterministic moving-gradient clip, repeated: the overfit target.

    A single fixed batch means the loss MUST drop if the step works — the
    basis of the trainer's end-to-end test (tests/test_train_driver.py).
    """
    f, h, w = cfg.clip_len, cfg.height, cfg.width
    t = np.arange(f, dtype=np.float32)[:, None, None, None]
    y = np.linspace(-1, 1, h, dtype=np.float32)[None, :, None, None]
    x = np.linspace(-1, 1, w, dtype=np.float32)[None, None, :, None]
    clip = np.concatenate(
        [np.sin(3 * x + 0.5 * t) * np.cos(2 * y),
         np.cos(4 * y - 0.3 * t) * 0.5 + 0.2 * x,
         np.sin(2 * (x + y) + t) * 0.7],
        axis=-1,
    ).astype(np.float32)
    batch = np.broadcast_to(clip, (cfg.batch, f, h, w, 3)).copy()
    while True:
        yield batch


class Trainer:
    """Builds models + programs once; `.fit()` runs the loop."""

    def __init__(self, cfg: TrainerConfig):
        import jax
        import jax.numpy as jnp

        from .models.unet import UNet3DConditionModel, UNetConfig
        from .models.vae import AutoencoderKL, VAEConfig
        from .parallel.mesh import batch_sharding, make_mesh, shard_params
        from .parallel.train import TrainState, make_optimizer, make_train_step

        self.cfg = cfg
        self.mesh = make_mesh(len(jax.devices()))
        dp = self.mesh.devices.shape[0]
        if cfg.batch % dp:
            raise ValueError(f"--batch {cfg.batch} must divide dp={dp}")

        if cfg.tiny:
            ucfg = UNetConfig(
                block_out_channels=(8, 16, 16, 16), attention_head_dim=2,
                cross_attention_dim=12, norm_num_groups=4,
                motion_num_attention_heads=2, cond_mapping=cfg.use_depth,
            )
            vcfg = VAEConfig(block_out_channels=(8, 8, 16, 16),
                             layers_per_block=1, norm_num_groups=4)
        else:
            ucfg = UNetConfig(cond_mapping=cfg.use_depth)
            vcfg = VAEConfig()
        self.unet = UNet3DConditionModel(config=ucfg, dtype=jnp.float32)
        self.vae = AutoencoderKL(config=vcfg, dtype=jnp.float32)

        rng = jax.random.PRNGKey(cfg.seed)
        r_unet, r_vae, r_text, self._rng = jax.random.split(rng, 4)

        # latent shape after the VAE's 8x downsample
        lh, lw = cfg.height // 8, cfg.width // 8
        b, f = cfg.batch, cfg.clip_len
        dummy_caches = tuple(
            jnp.zeros((0,), jnp.float32) for _ in range(ucfg.num_caches()))
        text_dim = ucfg.cross_attention_dim
        self._text_len = 7 if cfg.tiny else 77

        unet_params = self.unet.init(
            r_unet,
            jnp.zeros((b, f, lh, lw, 4), jnp.float32),
            jnp.zeros((b,), jnp.int32),
            jnp.zeros((b, self._text_len, text_dim), jnp.float32),
            jnp.zeros((b, f, lh, lw, 4), jnp.float32) if cfg.use_depth else None,
            dummy_caches, "clip", None, None, None,
        )
        vae_params = self.vae.init(
            r_vae, jnp.zeros((1, cfg.height, cfg.width, 3), jnp.float32))
        if cfg.sd_checkpoint:
            unet_params, vae_params = self._load_weights(
                cfg.sd_checkpoint, unet_params, vae_params)

        unet_params = shard_params(unet_params, self.mesh)
        self.vae_params = jax.device_put(vae_params)  # frozen, replicated

        optimizer = make_optimizer(cfg.lr, cfg.weight_decay)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=unet_params,
            opt_state=optimizer.init(unet_params), rng=self._rng,
        )
        self._step_fn = make_train_step(self.unet, optimizer, mesh=self.mesh)

        # caption embedding: real CLIP when a checkpoint supplies one,
        # fixed random embedding otherwise (deterministic per seed)
        self.text_embeds = np.asarray(jax.random.normal(
            r_text, (1, self._text_len, text_dim), jnp.float32))
        if cfg.sd_checkpoint:
            enc = self._encode_caption(cfg.sd_checkpoint, cfg.caption)
            if enc is not None:
                self.text_embeds = enc

        bsh = batch_sharding(self.mesh)
        scale = vcfg.scaling_factor

        def encode_clips(vp, clips):  # [B,F,H,W,3] -> [B,F,h,w,4] latents
            bb, ff = clips.shape[:2]
            flat = clips.reshape(bb * ff, *clips.shape[2:])
            z = self.vae.apply(vp, flat, method=self.vae.encode) * scale
            return z.reshape(bb, ff, *z.shape[1:])

        self._encode = jax.jit(
            encode_clips, in_shardings=(None, bsh), out_shardings=bsh)
        self._bsh = bsh

        if cfg.resume and cfg.ckpt_dir:
            self._maybe_resume()

    # -- weights ------------------------------------------------------------

    def _load_weights(self, path: str, unet_params, vae_params):
        """Merge ingested torch weights over the random init (best effort:
        missing keys stay random and are reported). ``path``: a .ckpt /
        .safetensors LDM checkpoint, converted with the same tools the
        inference builder uses (builder.py:190-288)."""
        from .builder import _merge_into_shapes  # same merge the pipeline uses
        from .convert import (
            convert_ldm_checkpoint, load_state_dict_file, unet_torch_to_flax,
            vae_torch_to_flax)

        sd = load_state_dict_file(path)
        unet_sd, vae_sd, _clip_sd = convert_ldm_checkpoint(sd)
        missing: list = []
        conv_u, _ = unet_torch_to_flax(unet_sd)
        unet_params = _merge_into_shapes(unet_params, conv_u, missing)
        conv_v, _ = vae_torch_to_flax(vae_sd)
        vae_params = _merge_into_shapes(vae_params, conv_v, missing)
        if missing:
            print(f"[train] {len(missing)} params not found in {path}; kept random")
        return unet_params, vae_params

    def _encode_caption(self, path: str, caption: str):
        try:
            from .models.text_encoder import (
                CLIPTextModelWithFinalNorm, encode_prompt)
            from .utils.tokenizer import CLIPTokenizer
        except Exception:
            return None
        try:
            tok = CLIPTokenizer.from_pretrained(path)
        except FileNotFoundError:
            return None
        ids = tok([caption])
        model = CLIPTextModelWithFinalNorm()
        import jax

        params = model.init(jax.random.PRNGKey(0), ids)
        return np.asarray(encode_prompt(model, params, ids))

    # -- checkpoint/resume --------------------------------------------------

    def _maybe_resume(self) -> None:
        from .parallel.checkpoint import latest_step_dir, restore_train_state

        latest = latest_step_dir(self.cfg.ckpt_dir)
        if latest:
            self.state = restore_train_state(latest, self.state)
            print(f"[train] resumed from {latest} (step {int(self.state.step)})")

    def save(self) -> Optional[str]:
        if not self.cfg.ckpt_dir:
            return None
        from .parallel.checkpoint import save_train_state

        path = os.path.join(self.cfg.ckpt_dir, f"step_{int(self.state.step)}")
        return save_train_state(path, self.state)

    # -- the loop ------------------------------------------------------------

    def batches(self) -> Iterator[np.ndarray]:
        if self.cfg.data:
            from .parallel.data import ClipDataset

            ds = ClipDataset(self.cfg.data, clip_len=self.cfg.clip_len,
                             stride=self.cfg.clip_len, height=self.cfg.height,
                             width=self.cfg.width)
            return ds.batches(self.cfg.batch, seed=self.cfg.seed)
        return synthetic_clips(self.cfg)

    def fit(self) -> dict:
        import jax

        cfg = self.cfg
        losses: list = []
        start = int(self.state.step)
        t0 = time.time()
        text = np.broadcast_to(
            self.text_embeds, (cfg.batch, *self.text_embeds.shape[1:]))
        for i, clips in enumerate(self.batches()):
            if start + i >= cfg.steps:
                break
            clips = jax.device_put(clips, self._bsh)
            latents = self._encode(self.vae_params, clips)
            batch = {"latents": latents, "text": jax.device_put(text, self._bsh)}
            if cfg.use_depth:
                batch["depth"] = jnp.zeros_like(latents)
            with self.mesh:
                self.state, loss = self._step_fn(self.state, batch)
            loss = float(loss)
            if not np.isfinite(loss):
                raise FloatingPointError(f"non-finite loss at step {start + i}")
            losses.append(loss)
            step = int(self.state.step)
            if cfg.log_every and step % cfg.log_every == 0:
                rate = (i + 1) / (time.time() - t0)
                print(f"[train] step {step} loss {loss:.5f} ({rate:.2f} it/s)")
            if cfg.ckpt_dir and cfg.save_every and step % cfg.save_every == 0:
                self.save()
        if cfg.ckpt_dir:
            self.save()
        k = max(len(losses) // 5, 1)
        return {
            "steps": len(losses),
            "first_loss": losses[0] if losses else None,
            "last_loss": losses[-1] if losses else None,
            "loss_head_mean": float(np.mean(losses[:k])) if losses else None,
            "loss_tail_mean": float(np.mean(losses[-k:])) if losses else None,
            "losses": losses,
        }


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    p.add_argument("--data", default=None, help="video root (omit = synthetic)")
    p.add_argument("--caption", default="a video clip")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--clip-len", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--save-every", type=int, default=100)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="tiny models + CPU + synthetic defaults")
    p.add_argument("--use-depth", action="store_true")
    p.add_argument("--sd-checkpoint", default=None)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)

    if a.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")

    defaults = TrainerConfig()
    cfg = TrainerConfig(
        data=a.data, caption=a.caption,
        steps=a.steps if a.steps is not None else (30 if a.tiny else 10000),
        batch=a.batch if a.batch is not None else defaults.batch,
        clip_len=a.clip_len if a.clip_len is not None else defaults.clip_len,
        height=a.height if a.height is not None else (64 if a.tiny else 256),
        width=a.width if a.width is not None else (64 if a.tiny else 256),
        lr=a.lr, ckpt_dir=a.ckpt_dir, save_every=a.save_every,
        log_every=a.log_every, resume=a.resume, tiny=a.tiny,
        use_depth=a.use_depth, sd_checkpoint=a.sd_checkpoint, seed=a.seed,
    )
    trainer = Trainer(cfg)
    stats = trainer.fit()
    out = {k: v for k, v in stats.items() if k != "losses"}
    print(json.dumps(out))
    return stats


if __name__ == "__main__":
    main()
