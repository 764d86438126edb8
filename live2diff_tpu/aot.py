"""AOT executable serialization: TensorRT-engine-style warm start.

The reference deserializes prebuilt TensorRT engines from its engine dir in
seconds (/root/reference/live2diff/acceleration/tensorrt/utilities.py:81-294,
wrapper.py:497-513). The XLA persistent compilation cache already gives us
compile-skip, but still pays Python trace + StableHLO lowering (~12-14 s per
program) and is keyed by the traced module — vulnerable to the compile
service's nondeterministic output-layout choices (see
stream/pipeline.py:_restore_formats).

This module serializes the two big COMPILED executables themselves
(``jax.jit(...).lower(...).compile()`` +
``jax.experimental.serialize_executable``): loading skips trace, lowering,
AND compilation, and the executable's layouts are pinned by construction.

Artifacts live under ``engines/aot/<key>-{prepare,step}.bin`` where the key
hashes jax version, device kind, cache schema, flash variant, stream config,
UNet config, and the frame dtype. A key mismatch or failed load returns
False and the caller falls back to the ordinary jit path — AOT is strictly
an accelerator, never a correctness dependency.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import time
from typing import Optional, Tuple

import numpy as np

AOT_SCHEMA = "aot1"


def _aot_key(stream, frame_dtype, prompt_len: int = 77) -> str:
    import jax

    dev = jax.devices()[0]
    parts = (
        AOT_SCHEMA,
        jax.__version__,
        getattr(dev, "device_kind", "unknown"),
        os.environ.get("LIVE2DIFF_FLASH", ""),
        repr(stream.cfg),
        repr(stream.unet.config),
        str(stream.num_steps),
        str(np.dtype(frame_dtype)),
        str(prompt_len),
        # param tree shapes/dtypes: catches tiny-vs-full models sharing a cfg
        str(jax.tree_util.tree_map(
            lambda a: (tuple(a.shape), str(a.dtype)), stream.params)),
    )
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:20]


def _paths(stream, cache_dir: str, frame_dtype,
           prompt_len: int = 77) -> Tuple[str, str, str]:
    key = _aot_key(stream, frame_dtype, prompt_len)
    return (
        os.path.join(cache_dir, f"{key}-prepare.bin"),
        os.path.join(cache_dir, f"{key}-step.bin"),
        key,
    )


def _example_args(stream, frame_dtype, prompt_len: int = 77):
    """Concrete example args for lower(): layouts are taken from the real
    arrays (params as device_put, state as init_state — the same canonical
    layouts every later call uses), so the serialized executable's input
    layouts match what production feeds it."""
    import jax.numpy as jnp

    cfg = stream.cfg
    state = stream.init_state(seed=0)
    prompts = jnp.zeros(
        (stream.num_steps, prompt_len, stream.unet.config.cross_attention_dim),
        jnp.float32)
    warmup = jnp.zeros((8, cfg.height, cfg.width, 3), jnp.float32)
    frame = jnp.zeros((cfg.height, cfg.width, 3), frame_dtype)
    return state, warmup, frame, prompts


def _pinned_jit(fn, example_args, donate=(1,)):
    """jit with in/out layouts pinned to the canonical default.

    A serialized executable is executed RAW at load time — unlike the jit
    dispatch path there is no automatic relayout of arguments, so an
    executable whose compiler-chosen input layouts differ from what
    production passes (device_put / init_state defaults) rejects every
    call (observed: 5/40 param layouts flipped). Pinning inputs AND
    outputs to the default layout makes the executable's contract exactly
    the arrays production already holds; donation stays coherent because
    the state's in/out layouts coincide by construction.
    """
    import jax
    from jax.experimental.layout import Format, Layout

    sh = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def fmt_of(x):
        return Format(Layout(tuple(range(x.ndim))), sh)

    in_f = jax.tree_util.tree_map(fmt_of, example_args)
    out_aval = jax.eval_shape(fn, *example_args)
    out_f = jax.tree_util.tree_map(fmt_of, out_aval)
    return jax.jit(fn, donate_argnums=donate,
                   in_shardings=in_f, out_shardings=out_f)


def save_executables(stream, cache_dir: str = "engines/aot",
                     frame_dtype=np.uint8,
                     prompt_len: int = 77) -> Optional[str]:
    """Compile (or fetch from the XLA cache) + serialize both programs.

    Run once per (config, resolution, kv-dtype, flash-variant) tuple — the
    AOT analogue of the reference's engine build step. Returns the key, or
    None if serialization is unsupported on this backend.
    """
    import jax  # noqa: F401  (device query inside _pinned_jit)
    from jax.experimental.serialize_executable import serialize

    os.makedirs(cache_dir, exist_ok=True)
    p_prepare, p_step, key = _paths(stream, cache_dir, frame_dtype, prompt_len)
    state, warmup, frame, prompts = _example_args(stream, frame_dtype, prompt_len)
    try:
        for path, fn, args in (
            (p_prepare, stream._warmup_denoise,
             (stream.params, state, warmup, prompts)),
            (p_step, stream._frame_step,
             (stream.params, stream.init_state(seed=0), frame, prompts)),
        ):
            if os.path.exists(path):
                continue
            compiled = _pinned_jit(fn, args).lower(*args).compile()
            payload, in_tree, out_tree = serialize(compiled)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump((payload, in_tree, out_tree), f)
            os.replace(tmp, path)
    except Exception as e:  # serialization support varies by backend
        print(f"[aot] save failed ({e!r}); persistent cache still applies")
        return None
    return key


def load_executables(stream, cache_dir: str = "engines/aot",
                     frame_dtype=np.uint8, prompt_len: int = 77) -> bool:
    """Swap the stream's jit wrappers for deserialized executables.

    Returns True on a full hit (both programs). On any failure the stream
    is left untouched (ordinary jit + persistent cache path).
    """
    import jax
    from jax.experimental.serialize_executable import deserialize_and_load

    p_prepare, p_step, _key = _paths(stream, cache_dir, frame_dtype, prompt_len)
    if not (os.path.isfile(p_prepare) and os.path.isfile(p_step)):
        return False
    try:
        t0 = time.perf_counter()
        loaded = []
        for path in (p_prepare, p_step):
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            loaded.append(deserialize_and_load(payload, in_tree, out_tree))
        prep, step = loaded
        # VALIDATE by executing: executable deserialization can succeed while
        # the loaded program is unusable (observed: a backend update between
        # save and load makes every launch fail INVALID_ARGUMENT — and the
        # failure surfaces asynchronously at the first fetch, past any
        # try/except around the call). One throwaway step + a concrete fetch
        # proves the executable end-to-end before we commit to it.
        state, _warmup, frame, prompts = _example_args(stream, frame_dtype,
                                                       prompt_len)
        _st, out = step(stream.params, state, frame, prompts)
        np.asarray(out)  # concrete fetch: surfaces async launch failures
        del _st
    except Exception as e:
        print(f"[aot] load/validate failed ({e!r}); falling back to jit")
        # stale artifacts (typically: the compile service restarted since the
        # save, invalidating every serialized executable) — remove so the
        # next successful run re-primes instead of re-failing forever
        for path in (p_prepare, p_step):
            try:
                os.unlink(path)
            except OSError:
                pass
        return False

    fallback_prepare = stream._jit_prepare
    fallback_step = stream._jit_step

    def guarded(compiled, fallback):
        def call(*args):
            try:
                return compiled(*args)
            except Exception:
                # shape/dtype drift (e.g. float32 camera frames against a
                # uint8-primed executable): recompile via the normal path
                return fallback(*args)
        return call

    stream._jit_prepare = guarded(prep, fallback_prepare)
    stream._jit_step = guarded(step, fallback_step)
    stream._aot_load_s = time.perf_counter() - t0
    return True
