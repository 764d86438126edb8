"""Pipeline builder: config -> models -> weights -> StreamDiffusionDepth.

The framework-side equivalent of the reference's wrapper ``_load_model``
(/root/reference/live2diff/utils/wrapper.py:334-640): resolve the style
config, build UNet/VAE/depth/text models, ingest checkpoints (DreamBooth,
motion module, LoRA list, LCM-LoRA, TinyVAE), and assemble the stream
runtime. When checkpoint files are absent (this environment has no weights),
models initialise randomly so the full pipeline still runs for benching and
integration tests — every missing artifact is reported.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import ConfigDict, load_config
from .convert import (
    clip_torch_to_flax,
    convert_ldm_checkpoint,
    load_state_dict_file,
    merge_lora_into_state_dict,
    taesd_torch_to_flax,
    unet_torch_to_flax,
    vae_torch_to_flax,
)
from .models.midas import DPTDepthModel
from .models.text_encoder import CLIPTextConfig, CLIPTextModelWithFinalNorm
from .models.unet import UNet3DConditionModel, UNetConfig
from .models.vae import AutoencoderKL, TinyAutoencoder, VAEConfig
from .schedule import LCMSchedule
from .stream.pipeline import StreamConfig, StreamDiffusionDepth
from .stream.state_machine import init_window_state, mask_to_bias


# shared random pools for placeholder-weight generation, keyed by dtype.
# 16M elements: bigger than almost every leaf, ~0.3 s to fill once.
_POOL_SIZE = 1 << 24
_NORMAL_POOLS: Dict[Any, np.ndarray] = {}


def _normal_pool(dtype) -> np.ndarray:
    key = np.dtype(dtype)
    pool = _NORMAL_POOLS.get(key)
    if pool is None:
        base = _NORMAL_POOLS.get(np.dtype(np.float32))
        if base is None:
            base = np.random.default_rng(1234).standard_normal(
                _POOL_SIZE, dtype=np.float32
            )
            _NORMAL_POOLS[np.dtype(np.float32)] = base
        pool = base if key == np.dtype(np.float32) else base.astype(key)
        _NORMAL_POOLS[key] = pool
    return pool


def _random_params_like(shapes_tree, seed: int = 0, scale: float = 0.02):
    """Random-normal PLACEHOLDER params matching an eval_shape tree.

    These stand in for absent checkpoints (benchmarks / integration tests);
    only shapes, dtypes, and rough magnitude matter. Three deliberate
    speed choices (cold start: this was 50 s of an 80 s build on one core):

    - host-side numpy, not ``jax.random``: per-leaf device RNG triggers one
      XLA compile per distinct shape (~170 compiles, ~90 s measured);
    - leaves are offset views into one shared 16M-element normal pool
      (tiled when a leaf is larger) instead of freshly drawn: fresh
      ``standard_normal`` + per-leaf bf16 casts cost ~34 s for ~700M params;
      the pool is cast once per dtype. Offsets are seed-deterministic, so
      equal seeds still give equal weights (the int8-vs-bf16 PSNR check
      relies on that);
    - ONE batched ``jax.device_put`` for the whole tree, not per leaf
      (1716 transfer round-trips cost ~13 s).

    On non-CPU backends the expansion runs ON DEVICE from a 64 MB pool
    upload instead of shipping ~1.4 GB of expanded leaves (the dev tunnel
    moves ~25 MB/s — the old upload WAS the build phase); set
    LIVE2DIFF_DEVICE_INIT=0 to force the host path.
    """
    leaves, treedef = jax.tree_util.tree_flatten(shapes_tree)
    rng = np.random.default_rng(seed)
    use_device = (
        os.environ.get("LIVE2DIFF_DEVICE_INIT", "1") != "0"
        and jax.default_backend() not in ("cpu",)
    )
    if use_device:
        try:
            out = _device_expand_params(leaves, rng, scale)
            return jax.tree_util.tree_unflatten(treedef, out)
        except Exception as e:  # pragma: no cover - fall back to upload
            print(f"[builder] device param init failed ({e!r}); uploading")
    host = []
    for l in leaves:
        dt = np.dtype(l.dtype)
        pool = _normal_pool(dt)
        n = max(int(np.prod(l.shape)), 1)
        start = int(rng.integers(0, _POOL_SIZE))
        if start + n <= pool.size:
            flat = pool[start : start + n]
        else:
            reps = -(-(start + n) // pool.size)  # ceil
            flat = np.tile(pool, reps)[start : start + n]
        arr = (flat.astype(np.float32) * scale).astype(dt) if scale != 1.0 else flat
        host.append(arr.reshape(l.shape))
    out = jax.device_put(host)
    return jax.tree_util.tree_unflatten(treedef, out)


_DEVICE_POOL = None


def _device_expand_params(leaves, rng, scale: float):
    """Expand placeholder leaves on device from the shared normal pool.

    One jitted program slices/tiles/scales/casts every leaf from the pool
    (64 MB uploaded once per process) — offsets ride in as a traced array
    so the program's cache key is seed-independent. Output layouts are
    pinned to the default (device_put-equivalent) layout so the big
    programs' input-layout-derived persistent-cache keys stay stable (see
    stream/pipeline.py:_restore_formats for why that matters).
    """
    global _DEVICE_POOL
    from jax.experimental.layout import Format, Layout

    if _DEVICE_POOL is None:
        _DEVICE_POOL = jax.device_put(_normal_pool(np.float32))

    shapes = tuple(tuple(l.shape) for l in leaves)
    dtypes = tuple(np.dtype(l.dtype) for l in leaves)
    starts = np.asarray(
        [int(rng.integers(0, _POOL_SIZE)) for _ in leaves], np.int32
    )

    def expand(pool, starts_arr):
        outs = []
        for i, (shape, dt) in enumerate(zip(shapes, dtypes)):
            n = max(int(np.prod(shape)), 1)
            if n <= _POOL_SIZE:
                # keep the slice in range: fold the start into [0, POOL-n]
                start = jnp.minimum(starts_arr[i], _POOL_SIZE - n)
                flat = jax.lax.dynamic_slice(pool, (start,), (n,))
            else:
                reps = n // _POOL_SIZE + 1
                tiled = jnp.tile(pool, reps + 1)
                flat = jax.lax.dynamic_slice(tiled, (starts_arr[i],), (n,))
            arr = (flat * scale).astype(dt) if scale != 1.0 else flat.astype(dt)
            outs.append(arr.reshape(shape))
        return tuple(outs)

    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    out_formats = tuple(
        Format(Layout(tuple(range(len(s)))), sharding) for s in shapes
    )
    fn = jax.jit(expand, out_shardings=out_formats)
    return list(fn(_DEVICE_POOL, jnp.asarray(starts)))


@dataclasses.dataclass
class BuiltPipeline:
    stream: StreamDiffusionDepth
    unet: UNet3DConditionModel
    unet_params: Any
    schedule: LCMSchedule
    stream_config: StreamConfig
    vae_apply: Tuple[Any, Any]  # (encode_fn, decode_fn)
    text_encoder: Optional[CLIPTextModelWithFinalNorm]
    text_params: Any
    tokenizer: Any
    depth_model: Optional[DPTDepthModel]
    missing_artifacts: Tuple[str, ...]
    prompt_template: str = "{}"
    clip_skip: int = 1
    # per-LoRA factor records for runtime re-strengthening:
    # {path: {"records": [(which, key, up, down, unit)], "fused_alpha": a}}
    lora_runtime: Dict[str, dict] = dataclasses.field(default_factory=dict)


def build_pipeline(
    config: str | Dict,
    height: int = 512,
    width: int = 512,
    num_inference_steps: Optional[int] = None,
    t_index_list=None,
    strength: Optional[float] = None,
    use_tiny_vae: bool = True,
    use_depth: bool = True,
    use_text_encoder: bool = False,
    dtype=jnp.bfloat16,
    seed: int = 0,
    do_add_noise: bool = True,
    use_lcm_lora: bool = True,
    lcm_lora_path: Optional[str] = None,
    lora_dict: Optional[Dict[str, float]] = None,
    unet_overrides: Optional[Dict] = None,
    param_dtype=None,
    kv_cache_dtype=None,
    output_uint8: bool = False,
) -> BuiltPipeline:
    """Build the full streaming pipeline from a reference-style YAML config."""
    cfg: ConfigDict = load_config(config) if isinstance(config, str) else ConfigDict.wrap(config)
    missing = []
    # inference default: store params in the compute dtype (bf16 on TPU) —
    # fp32 masters double HBM for no inference benefit
    param_dtype = param_dtype or dtype

    # ---- schedule -------------------------------------------------------
    num_inference_steps = num_inference_steps or cfg.get("num_inference_steps", 50)
    t_index_list = t_index_list or cfg.get("t_index_list")
    strength = strength if strength is not None else cfg.get("strength")
    schedule = LCMSchedule.from_config(
        cfg.get("noise_scheduler_kwargs", {}) or {},
        num_inference_steps=num_inference_steps,
        t_index_list=t_index_list,
        strength=strength,
    )
    n = schedule.num_steps

    # ---- UNet -----------------------------------------------------------
    unet_cfg = UNetConfig.from_reference_config(
        cfg.to_dict() if hasattr(cfg, "to_dict") else cfg, **(unet_overrides or {})
    )
    unet = UNet3DConditionModel(config=unet_cfg, dtype=dtype, param_dtype=param_dtype)

    # int8 caches (kv_cache_dtype=jnp.int8 or "int8"): half cache HBM and
    # stream-attention bandwidth; ~0.4% per-element quantisation error
    if isinstance(kv_cache_dtype, str):
        kv_cache_dtype = {"int8": jnp.int8, "bf16": jnp.bfloat16,
                          "bfloat16": jnp.bfloat16}[kv_cache_dtype]
    cache_dtype = kv_cache_dtype or dtype
    scfg = StreamConfig(
        height=height, width=width,
        vae_scaling=1.0 if use_tiny_vae else 0.18215,
        do_add_noise=do_add_noise,
        cache_dtype=cache_dtype,
        output_uint8=output_uint8,
    )
    lh, lw = scfg.latent_height, scfg.latent_width

    caches = unet_cfg.init_caches(lh, lw, n, dtype=cache_dtype)
    mask, pe_idx, update_idx = init_window_state(n, unet_cfg.window_size, unet_cfg.sink_size)
    init_args = (
        jnp.zeros((n, 1, lh, lw, 4), dtype), jnp.zeros((n,), jnp.int32),
        jnp.zeros((n, 77, unet_cfg.cross_attention_dim), dtype),
        jnp.zeros((n, 1, lh, lw, 4), dtype),
        caches, "stream", mask_to_bias(mask), pe_idx, update_idx,
    )
    unet_shapes = jax.eval_shape(lambda: unet.init(jax.random.PRNGKey(0), *init_args))

    # weight ingest: SD-1.5 base + motion module ckpt + dreambooth + LoRAs
    unet_sd: Dict[str, np.ndarray] = {}
    text_sd: Dict[str, np.ndarray] = {}
    vae_sd: Dict[str, np.ndarray] = {}

    base_path = cfg.get("pretrained_model_path")
    if base_path and os.path.isdir(base_path):
        for sub, target in (("unet", unet_sd), ("vae", vae_sd), ("text_encoder", text_sd)):
            for fname in ("diffusion_pytorch_model.safetensors", "model.safetensors",
                          "diffusion_pytorch_model.bin", "pytorch_model.bin"):
                p = os.path.join(base_path, sub, fname)
                if os.path.isfile(p):
                    target.update(load_state_dict_file(p))
                    break
            else:
                missing.append(f"{base_path}/{sub}")
    else:
        missing.append(str(base_path))

    mm_path = cfg.get("motion_module_path")
    if mm_path and os.path.isfile(mm_path):
        mm_sd = load_state_dict_file(mm_path)
        # normalise DataParallel-style "module." prefixes and drop optical-flow
        # "grid" buffers (the reference filters these too,
        # pipeline_animatediff_depth.py:279-290)
        unet_sd.update({
            k.removeprefix("module."): v
            for k, v in mm_sd.items()
            if "grid" not in k.split(".")[-1]
        })
    else:
        missing.append(str(mm_path))

    tp = cfg.get("third_party_dict", {}) or {}
    db_path = tp.get("dreambooth")
    if db_path and os.path.isfile(db_path):
        db_sd = load_state_dict_file(db_path)
        db_unet, db_vae, db_clip = convert_ldm_checkpoint(db_sd)
        unet_sd.update(db_unet)
        vae_sd.update(db_vae)
        text_sd.update(db_clip)
    elif db_path:
        missing.append(str(db_path))

    all_loras = list(tp.get("lora_list", []) or [])
    if lora_dict:
        all_loras += [{"lora": k, "lora_alpha": v} for k, v in lora_dict.items()]
    # LCM-LoRA is fused unconditionally by the reference
    # (/root/reference/live2diff/utils/wrapper.py:421-426,451-452:
    # ``stream.load_lora("latent-consistency/lcm-lora-sdv1-5"); fuse_lora()``)
    # — without it, 2-step LCM denoising of a plain SD-1.5 UNet is garbage.
    if use_lcm_lora:
        lcm_path = (
            lcm_lora_path
            or cfg.get("lcm_lora_path")
            or "models/loras/lcm-lora-sdv1-5.safetensors"
        )
        all_loras.append({"lora": str(lcm_path), "lora_alpha": 1.0})
    lora_runtime: Dict[str, dict] = {}
    for entry in all_loras:
        lpath, alpha = entry.get("lora"), entry.get("lora_alpha", 1.0)
        if lpath and os.path.isfile(lpath):
            records: list = []
            merge_lora_into_state_dict(
                unet_sd, text_sd, load_state_dict_file(lpath), lora_alpha=alpha,
                collect=records,
            )
            # factors kept for runtime re-strengthening (wrapper.update_lora_scale)
            lora_runtime[str(lpath)] = {"records": records, "fused_alpha": alpha}
        else:
            missing.append(str(lpath))

    if unet_sd:
        converted, _skipped = unet_torch_to_flax(unet_sd)
        unet_params = _merge_into_shapes(unet_shapes, converted, missing)
    else:
        unet_params = _random_params_like(unet_shapes, seed=seed)

    # ---- VAE ------------------------------------------------------------
    if use_tiny_vae:
        vae = TinyAutoencoder(dtype=dtype, param_dtype=param_dtype)
        vae_shapes = jax.eval_shape(
            lambda: vae.init(jax.random.PRNGKey(1), jnp.zeros((1, height, width, 3), dtype))
        )
        taesd_path = cfg.get("taesd_path", "models/taesd.safetensors")
        if taesd_path and os.path.isfile(taesd_path):
            converted, _ = taesd_torch_to_flax(load_state_dict_file(taesd_path))
            vae_params = _merge_into_shapes(vae_shapes, converted, missing)
        else:
            missing.append(str(taesd_path))
            vae_params = _random_params_like(vae_shapes, seed=seed + 1)
    else:
        vae = AutoencoderKL(config=VAEConfig(), dtype=dtype, param_dtype=param_dtype)
        vae_shapes = jax.eval_shape(
            lambda: vae.init(jax.random.PRNGKey(1), jnp.zeros((1, height, width, 3), dtype))
        )
        if vae_sd:
            converted, _ = vae_torch_to_flax(vae_sd)
            vae_params = _merge_into_shapes(vae_shapes, converted, missing)
        else:
            vae_params = _random_params_like(vae_shapes, seed=seed + 1)

    # (params, x) signatures: weights are jit arguments, never baked constants
    vae_encode = lambda p, x: vae.apply(  # noqa: E731
        p, x.astype(dtype), method=vae.encode
    ).astype(jnp.float32)
    vae_decode = lambda p, z: vae.apply(  # noqa: E731
        p, z.astype(dtype), method=vae.decode
    ).astype(jnp.float32)

    # ---- depth ----------------------------------------------------------
    depth_model = depth_fn = depth_params = None
    if use_depth:
        depth_model = DPTDepthModel(dtype=dtype, param_dtype=param_dtype)
        depth_shapes = jax.eval_shape(
            lambda: depth_model.init(jax.random.PRNGKey(2), jnp.zeros((1, 384, 384, 3), dtype))
        )
        dpt_path = cfg.get("depth_model_path")
        if dpt_path and os.path.isfile(dpt_path):
            from .convert.midas import dpt_torch_to_flax

            converted, _ = dpt_torch_to_flax(load_state_dict_file(dpt_path))
            depth_params = _merge_into_shapes(depth_shapes, converted, missing)
        else:
            missing.append(str(dpt_path))
            depth_params = _random_params_like(depth_shapes, seed=seed + 2)
        depth_fn = lambda p, x: depth_model.apply(  # noqa: E731
            p, x.astype(dtype)
        ).astype(jnp.float32)

    # ---- text encoder ----------------------------------------------------
    text_encoder = text_params = tokenizer = None
    if use_text_encoder:
        text_encoder = CLIPTextModelWithFinalNorm(
            config=CLIPTextConfig(), dtype=dtype, param_dtype=param_dtype
        )
        text_shapes = jax.eval_shape(
            lambda: text_encoder.init(jax.random.PRNGKey(3), jnp.zeros((1, 77), jnp.int32))
        )
        if text_sd:
            converted, _ = clip_torch_to_flax(text_sd)
            text_params = _merge_into_shapes(text_shapes, converted, missing)
        else:
            text_params = _random_params_like(text_shapes, seed=seed + 3)
        from .utils.tokenizer import CLIPTokenizer

        if base_path and os.path.isdir(os.path.join(str(base_path), "tokenizer")):
            tokenizer = CLIPTokenizer.from_pretrained(str(base_path))
        else:
            tokenizer = CLIPTokenizer.tiny(model_max_length=77)
            missing.append(f"{base_path}/tokenizer")

        # textual inversion from third_party_dict, as the reference applies it
        # (/root/reference/live2diff/animatediff/converter/convert.py:64-96:
        # ``pipeline.load_textual_inversion(path, token)`` per entry)
        for token, ti_path in (tp.get("text_embedding_dict", {}) or {}).items():
            if ti_path and os.path.isfile(str(ti_path)):
                from .convert.textual_inversion import apply_textual_inversion

                tokenizer, text_params = apply_textual_inversion(
                    tokenizer, text_params, load_state_dict_file(str(ti_path)), token
                )
            else:
                missing.append(str(ti_path))
        # the injected rows grow the embedding table; rebuild the module with
        # the new vocab size (the resize_token_embeddings step in the ref flow)
        n_vocab = int(np.asarray(
            text_params["params"]["text_model"]["token_embedding"]["embedding"]
        ).shape[0])
        if n_vocab != text_encoder.config.vocab_size:
            text_encoder = CLIPTextModelWithFinalNorm(
                config=dataclasses.replace(text_encoder.config, vocab_size=n_vocab),
                dtype=dtype, param_dtype=param_dtype,
            )

    stream = StreamDiffusionDepth(
        unet, unet_params, schedule, scfg, vae_encode, vae_decode, depth_fn,
        vae_params=vae_params, depth_params=depth_params,
    )
    return BuiltPipeline(
        stream=stream,
        unet=unet,
        unet_params=unet_params,
        schedule=schedule,
        stream_config=scfg,
        vae_apply=(vae_encode, vae_decode),
        text_encoder=text_encoder,
        text_params=text_params,
        tokenizer=tokenizer,
        depth_model=depth_model,
        missing_artifacts=tuple(missing),
        prompt_template=cfg.get("prompt_template", cfg.get("prompt", "{}")),
        clip_skip=(cfg.get("third_party_dict", {}) or {}).get("clip_skip", 1),
        lora_runtime=lora_runtime,
    )


def _merge_into_shapes(shapes_tree, converted: dict, missing: list):
    """Overlay converted params onto the expected tree; random-fill gaps."""
    base = _random_params_like(shapes_tree)

    def merge(expect, got, path=""):
        if not isinstance(expect, dict):
            if got is None:
                missing.append(f"param:{path}")
                return expect
            got = np.asarray(got)  # host-side cast: no per-shape XLA compiles
            if got.shape != expect.shape:
                missing.append(f"shape-mismatch:{path} {got.shape} vs {expect.shape}")
                return expect
            return jax.device_put(got.astype(np.dtype(expect.dtype)))
        out = {}
        for k, v in expect.items():
            g = got.get(k) if isinstance(got, dict) else None
            out[k] = merge(v, g, f"{path}/{k}")
        return out

    return merge(base, converted)


def encode_prompt_for_pipeline(built: BuiltPipeline, prompt: str) -> jnp.ndarray:
    """Tokenize + CLIP-encode a prompt with the pipeline's clip_skip."""
    if built.text_encoder is None:
        # no text encoder built (benchmark mode): deterministic pseudo-embedding
        rs = np.random.RandomState(abs(hash(prompt)) % (2**31))
        return jnp.asarray(rs.randn(1, 77, 768).astype(np.float32))
    ids = built.tokenizer([prompt])
    return built.text_encoder.apply(
        built.text_params, jnp.asarray(ids), clip_skip=built.clip_skip
    ).astype(jnp.float32)
