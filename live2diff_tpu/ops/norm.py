"""Pallas TPU kernel: fused GroupNorm (+ optional SiLU) with fp32 statistics.

XLA lowers channels-last GroupNorm into multi-stage partial reductions with
layout-hostile `[rows, 16, 9, C]` intermediates (each GN in the UNet costs
~0.2-0.3 ms at the 64x64-latent level — 40x off the memory bound, ~5 ms per
frame across the ~45 hot GroupNorms). This kernel does the whole thing in
one VMEM residency per sample: one token-axis reduction, a tiny one-hot
matmul to fold channel groups (lane reductions are VPU-hostile; the MXU does
them for free), and the normalize+affine+activation applied on the way out.

Semantics match ``flax.linen.GroupNorm(num_groups, epsilon)`` over ``[B, T,
C]`` with per-B statistics (the framework folds video frames into B first —
per-frame statistics, reference InflatedGroupNorm semantics,
/root/reference/live2diff/animatediff/models/resnet.py:68-77).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# fp32 VMEM footprint cap for the in-kernel [T, C] block
_MAX_ELEMS = 3 * 1024 * 1024

# A/B knobs: the norm kernels win in isolation but can lose globally by
# breaking XLA's conv+norm mega-fusions (space-to-depth conv schedules fold
# the GN stats pass in). Default picks are set from traced full-step A/Bs.
_GN_KERNEL = os.environ.get("LIVE2DIFF_GN_KERNEL", "1") != "0"
# Which call sites use the Pallas GN kernel. Traced full-step A/Bs: ANY
# norm custom-call adjacent to the UNet/MiDaS convs breaks XLA's
# space-to-depth conv schedules and costs ~8 ms/frame globally (kernel-off
# full step 46.7 ms vs 54.4-55.0 for every kernel-on combination), far more
# than the ~1 ms the kernel itself saves. Default: off everywhere
# ("none" matches no site); opt in per site or with "all" for experiments.
_GN_TAGS = os.environ.get("LIVE2DIFF_GN_TAGS", "none")
_GN_SITE_TAGS = {t.strip() for t in _GN_TAGS.split(",") if t.strip()}
if "all" in _GN_SITE_TAGS:
    _GN_SITE_TAGS = set()
_LN_KERNEL = os.environ.get("LIVE2DIFF_LN_KERNEL", "1") != "0"
# debug bisect: restrict the LN kernel to given channel sizes, e.g. "320,640"
_LN_SITES = os.environ.get("LIVE2DIFF_LN_SITES", "")
_LN_SITE_SET = {int(s) for s in _LN_SITES.split(",") if s.strip()} if _LN_SITES else None
# Which call sites use the Pallas LN kernel. Default: the DPT ViT tower only.
# The UNet sites ("spatial", "temporal") are gated off for PERFORMANCE, not
# correctness: traced full-step A/Bs show the custom-call breaks XLA's
# conv-adjacent fusions and loses ~1 ms net (GN=off+LN=all 53.7 ms vs 52.7
# with LN=vit only at the time of measurement). The earlier TPU hard-fault at
# these sites was root-caused to the grid's out-of-bounds tail block when
# rows % block != 0 and fixed by padding rows to an exact block multiple
# (see _layer_norm_kernel); LIVE2DIFF_LN_TAGS="all" runs clean post-fix.
_LN_TAGS = os.environ.get("LIVE2DIFF_LN_TAGS", "vit")
_LN_SITE_TAGS = {t.strip() for t in _LN_TAGS.split(",") if t.strip()}
if "all" in _LN_SITE_TAGS:
    _LN_SITE_TAGS = set()
# GN fallback variance algorithm: "twopass" (default, centered) or
# "shifted" (one-pass over x-x0; same HBM reads as the old single-pass,
# conditioning ~the two-pass). A/B knob for full-step scheduling effects.
_GN_VAR = os.environ.get("LIVE2DIFF_GN_VAR", "twopass")


def _kernel(x_ref, g_ref, b_ref, o_ref, *, groups, eps, act):
    x = x_ref[0]  # [T, C] input dtype
    t, c = x.shape
    cg = c // groups
    xf = x.astype(jnp.float32)

    s = jnp.sum(xf, axis=0, keepdims=True)  # [1, C]

    # fold channels into groups with a one-hot matmul (MXU), then broadcast
    # the per-group stats back to channels the same way
    ci = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gi = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = (ci // cg == gi).astype(jnp.float32)  # [C, G]

    n = jnp.float32(t * cg)
    mean_g = jax.lax.dot_general(s, m, (((1,), (0,)), ((), ()))) / n  # [1, G]
    mean_c = jax.lax.dot_general(mean_g, m, (((1,), (1,)), ((), ())))  # [1, C]

    # two-pass (centered) variance: E[x^2]-mean^2 cancels catastrophically
    # in fp32 when |mean| >> std (bit us at small groups, e.g. the 1x1-
    # spatial mid block where a group is 2 values); x is already in VMEM so
    # the second pass is cheap
    xc = xf - mean_c
    ssc = jnp.sum(xc * xc, axis=0, keepdims=True)  # [1, C]
    var_g = jax.lax.dot_general(ssc, m, (((1,), (0,)), ((), ()))) / n
    inv_g = jax.lax.rsqrt(var_g + eps)
    inv_c = jax.lax.dot_general(inv_g, m, (((1,), (1,)), ((), ())))  # [1, C]

    scale = inv_c * g_ref[0].astype(jnp.float32)  # [1, C]
    y = xc * scale + b_ref[0].astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "act"))
def _group_norm_kernel(x, gamma, beta, groups: int, eps: float, act: str):
    b, t, c = x.shape
    return pl.pallas_call(
        functools.partial(_kernel, groups=groups, eps=eps, act=act),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, gamma[None], beta[None])


def group_norm_act(
    x: jnp.ndarray,  # [B, T, C]
    gamma: jnp.ndarray,  # [C]
    beta: jnp.ndarray,  # [C]
    groups: int = 32,
    eps: float = 1e-5,
    act: str = "none",
    site: str = "",
) -> jnp.ndarray:
    """GroupNorm over [B, T, C] with per-B fp32 statistics, optional SiLU.

    Dispatches to the Pallas kernel on TPU when the [T, C] slab fits VMEM;
    otherwise (CPU tests, oversized inputs) runs the same math in XLA.
    """
    from .attention import _on_tpu

    b, t, c = x.shape
    if (
        _GN_KERNEL
        and _on_tpu()
        and t * c <= _MAX_ELEMS
        and c % groups == 0
        and c % 8 == 0
        and (not _GN_SITE_TAGS or site in _GN_SITE_TAGS)
    ):
        return _group_norm_kernel(x, gamma, beta, groups, eps, act)

    xf = x.astype(jnp.float32)
    cg = c // groups
    if _GN_VAR == "shifted":
        # one-pass shifted variance: statistics of (x - x0) where x0 is each
        # group's first element. Same read count as the old E[x^2]-mean^2
        # form, but the cancellation scale drops from mean^2 to
        # (mean-x0)^2 ~ var, so conditioning matches the two-pass form for
        # real activations. A/B knob vs the default two-pass.
        x0 = jnp.repeat(xf[:, :1].reshape(b, 1, groups, cg)[..., :1]
                        .reshape(b, groups), cg, axis=-1)  # [B, C]
        xs = xf - x0[:, None, :]
        s_g = xs.reshape(b, t, groups, cg).mean(axis=(1, 3))  # E[x-x0]
        ss_g = (xs * xs).reshape(b, t, groups, cg).mean(axis=(1, 3))
        var = ss_g - s_g * s_g
        mean_c = jnp.repeat(s_g, cg, axis=-1) + x0
        xc = xf - mean_c[:, None, :]
    else:
        # two-pass (centered) variance — see the kernel comment above
        mean_g = xf.reshape(b, t, groups, cg).mean(axis=(1, 3))  # [B, G]
        mean_c = jnp.repeat(mean_g, cg, axis=-1)  # [B, C]
        xc = xf - mean_c[:, None, :]
        var = (xc * xc).reshape(b, t, groups, cg).mean(axis=(1, 3))
    inv = jax.lax.rsqrt(var + eps)
    scale = jnp.repeat(inv, cg, axis=-1) * gamma.astype(jnp.float32)
    y = xc * scale[:, None, :] + beta.astype(jnp.float32)[None, None, :]
    if act == "silu":
        y = jax.nn.silu(y)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# LayerNorm
# ---------------------------------------------------------------------------


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps):
    xf = x_ref[...].astype(jnp.float32)  # [bt, C]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)  # centered: no E[x^2]-m^2
    inv = jax.lax.rsqrt(var + eps)
    y = xc * inv * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps",))
def _layer_norm_kernel(x, gamma, beta, eps: float):
    n0, c = x.shape
    bt = max(16, min(n0, (2 * 1024 * 1024) // (4 * c) // 16 * 16))
    # pad rows to an exact block multiple: no out-of-bounds tail block (the
    # masked-OOB path is the prime suspect in the in-graph UNet faults)
    n = (n0 + bt - 1) // bt * bt
    if n != n0:
        x = jnp.pad(x, ((0, n - n0), (0, 0)))
    grid = (n // bt,)
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, gamma[None], beta[None])[:n0]


def layer_norm(
    x: jnp.ndarray,  # [..., C]
    gamma: jnp.ndarray,  # [C]
    beta: jnp.ndarray,  # [C]
    eps: float = 1e-5,
    site: str = "",
) -> jnp.ndarray:
    """LayerNorm over the trailing axis, fp32 statistics, per-row.

    Pallas kernel on TPU (XLA's convert+reduce lowering runs well off the
    memory bound for channels-last rows); plain XLA elsewhere.
    """
    from .attention import _on_tpu

    c = x.shape[-1]
    if (
        _LN_KERNEL
        and _on_tpu()
        and c % 8 == 0
        and x.size >= 1 << 14
        and (_LN_SITE_SET is None or c in _LN_SITE_SET)
        and (not _LN_SITE_TAGS or site in _LN_SITE_TAGS)
    ):
        shape = x.shape
        y = _layer_norm_kernel(x.reshape(-1, c), gamma, beta, eps)
        return y.reshape(shape)

    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype)
