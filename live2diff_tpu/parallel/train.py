"""Motion-module training: multi-chip diffusion training step.

The reference is inference-only; its motion modules were trained
AnimateDiff-style (uni-directional temporal attention over video clips with
the standard epsilon-prediction diffusion loss — paper arXiv 2407.08701).
This module provides that training step, TPU-native: the whole
forward+backward+optimizer update is one pjit'd program over a (dp, tp)
mesh; clips shard on dp, attention/MLP weights on tp, gradients reduce over
ICI via GSPMD-inserted collectives.

Only the motion-module parameters train (the SD-1.5 spatial weights stay
frozen), matching how the reference's ``live2diff.ckpt`` was produced.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.unet import UNet3DConditionModel, UNetConfig
from ..schedule import make_betas


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: dict
    opt_state: optax.OptState
    rng: jax.Array


def _is_motion_param(path_entries) -> bool:
    return any("motion_modules" in str(getattr(e, "key", e)) for e in path_entries)


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01) -> optax.GradientTransformation:
    """AdamW over motion-module params only; everything else frozen."""
    adamw = optax.adamw(lr, weight_decay=weight_decay)
    return optax.multi_transform(
        {"train": adamw, "freeze": optax.set_to_zero()},
        param_labels=lambda params: jax.tree_util.tree_map_with_path(
            lambda path, _: "train" if _is_motion_param(path) else "freeze", params
        ),
    )


def diffusion_loss_fn(
    unet: UNet3DConditionModel,
    params,
    batch: dict,
    rng: jax.Array,
    alphas_cumprod: jnp.ndarray,
    num_train_timesteps: int = 1000,
):
    """Standard epsilon-prediction MSE on video clips.

    batch: {"latents": [B, F, h, w, 4], "text": [B, 77, 768],
            "depth": [B, F, h, w, 4]}
    Temporal attention runs in 'clip' mode (bidirectional over the clip).
    """
    latents = batch["latents"]
    b = latents.shape[0]
    r_t, r_noise = jax.random.split(rng)
    t = jax.random.randint(r_t, (b,), 0, num_train_timesteps)
    noise = jax.random.normal(r_noise, latents.shape, latents.dtype)
    a = alphas_cumprod[t][:, None, None, None, None]
    noisy = jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * noise

    num_caches = unet.config.num_caches()
    dummy_caches = tuple(jnp.zeros((0,), latents.dtype) for _ in range(num_caches))
    pred, _ = unet.apply(
        params,
        noisy.astype(unet.dtype),
        t.astype(jnp.int32),
        batch["text"].astype(unet.dtype),
        batch.get("depth"),
        dummy_caches,
        "clip",
        None,
        None,
        None,
    )
    return jnp.mean((pred.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)


def make_train_step(
    unet: UNet3DConditionModel,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    num_train_timesteps: int = 1000,
):
    """Build the jitted (optionally mesh-sharded) train step."""
    alphas_cumprod = jnp.asarray(
        jnp.cumprod(1.0 - jnp.asarray(make_betas(num_train_timesteps)))
    , dtype=jnp.float32)

    def train_step(state: TrainState, batch: dict) -> Tuple[TrainState, jnp.ndarray]:
        rng, step_rng = jax.random.split(state.rng)
        loss, grads = jax.value_and_grad(
            lambda p: diffusion_loss_fn(
                unet, p, batch, step_rng, alphas_cumprod, num_train_timesteps
            )
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state, rng=rng),
            loss,
        )

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    batch_sharding = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        train_step,
        donate_argnums=(0,),
        # one sharding for every batch leaf (latents/text/optional depth all
        # lead with the clip axis) — a fixed key-set here rejected batches
        # without depth
        in_shardings=(None, batch_sharding),
        out_shardings=(None, repl),
    )


def train_step_dryrun(n_devices: int, latent: int = 8, frames: int = 4) -> float:
    """One tiny multi-chip training step; used by __graft_entry__.dryrun_multichip.

    Builds an n-device (dp, tp) mesh, shards params (tp) and the clip batch
    (dp), and executes one fused forward+backward+AdamW update.
    """
    from .mesh import make_mesh, shard_params

    mesh = make_mesh(n_devices)
    dp = mesh.devices.shape[0]

    cfg = UNetConfig(
        block_out_channels=(8, 16, 16, 16), attention_head_dim=2,
        cross_attention_dim=12, norm_num_groups=4, motion_num_attention_heads=2,
    )
    unet = UNet3DConditionModel(config=cfg, dtype=jnp.float32)

    b = max(dp, 2)
    batch = {
        "latents": jnp.ones((b, frames, latent, latent, 4), jnp.float32) * 0.1,
        "text": jnp.zeros((b, 7, cfg.cross_attention_dim), jnp.float32),
        "depth": jnp.zeros((b, frames, latent, latent, 4), jnp.float32),
    }
    num_caches = cfg.num_caches()
    dummy_caches = tuple(jnp.zeros((0,), jnp.float32) for _ in range(num_caches))
    params = unet.init(
        jax.random.PRNGKey(0),
        batch["latents"], jnp.zeros((b,), jnp.int32), batch["text"], batch["depth"],
        dummy_caches, "clip", None, None, None,
    )
    params = shard_params(params, mesh)

    optimizer = make_optimizer()
    opt_state = optimizer.init(params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state,
        rng=jax.random.PRNGKey(1),
    )

    from jax.sharding import NamedSharding, PartitionSpec as P

    bsh = NamedSharding(mesh, P("dp"))
    batch = jax.tree_util.tree_map(lambda x: jax.device_put(x, bsh), batch)

    step_fn = make_train_step(unet, optimizer, mesh=mesh)
    with mesh:
        state, loss = step_fn(state, batch)
        loss = float(loss)
    assert jnp.isfinite(loss), f"non-finite training loss: {loss}"
    return loss
