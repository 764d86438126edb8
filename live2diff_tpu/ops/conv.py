"""Pallas TPU kernel: fused 3x3 stride-1 SAME conv (+bias +skip +ReLU).

Motivation: the TAESD decoder runs six 3x3/64-channel convs at full 512x512
resolution per frame. XLA's conv lowering for batch-1, 64-channel NHWC picks
a space-to-depth schedule that costs ~2.9 ms per conv on v5e — ~30x off the
memory bound. This kernel streams row-bands of the (pre-padded) input
through VMEM with an explicit halo DMA and computes the conv as 9 shifted
[rows*W, C] x [C, Co] MXU matmuls with fp32 accumulation, fusing bias, the
residual skip, and ReLU into the same pass.

Used by the TinyVAE (TAESD) blocks via ``models/vae.py``; parity with
``nn.Conv`` is covered by an interpret-mode test.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, b_ref, *rest, bh, width, cin, cout, relu, has_skip):
    if has_skip:
        skip_ref, o_ref, x_vmem, sem = rest
    else:
        o_ref, x_vmem, sem = rest
        skip_ref = None
    b = pl.program_id(0)
    i = pl.program_id(1)

    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * bh, bh + 2)], x_vmem, sem
    )
    copy.start()
    copy.wait()

    acc = jnp.zeros((bh * width, cout), jnp.float32)
    # slice the (sublane) width shift once per dx — the row (dy) shift is on
    # the leading dim and free — so only 3 misaligned-sublane relayouts
    # happen instead of 9
    for dx in range(3):
        xs = x_vmem[:, dx : dx + width, :]  # [bh+2, W, Cin]
        for dy in range(3):
            patch = xs[dy : dy + bh].reshape(bh * width, cin)
            acc = acc + jnp.dot(
                patch, w_ref[dy, dx], preferred_element_type=jnp.float32
            )
    acc = acc + b_ref[0].astype(jnp.float32)
    out = acc.reshape(bh, width, cout)
    if skip_ref is not None:
        out = out + skip_ref[0].astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    o_ref[0] = out.astype(o_ref.dtype)


def _pack_weights(w: jnp.ndarray, p: int) -> jnp.ndarray:
    """Re-express a 3x3 conv as a 3x3 conv over W-packed pixels.

    Packing p horizontally adjacent pixels into the channel axis turns a
    [H, W, C] tensor into [H, W/p, p*C] (a free, layout-preserving reshape)
    and the conv's weights into block-structured [3, 3, p*Cin, p*Cout]:
    output subpixel ``b`` at packed column j reads original column
    ``p*j + b + dx - 1``, which lives in packed column ``j + dxp - 1``,
    subpixel ``a``. Each (dy, dxp, a, b) block holds at most one original
    tap, so the packed matmul does p x the original MACs — but with p*C on
    both contraction and output lanes it runs the MXU at full width instead
    of zero-padding C up to 128 (2x win for the TAESD's C=64, and it halves
    the halo-pad HBM traffic).
    """
    kh, kw, cin, cout = w.shape
    # one einsum with a constant 0/1 selection tensor instead of p*kw
    # dynamic-update-slices: the packing runs inside the jitted step (weights
    # are jit arguments), and the DUS form cost ~0.8 ms/frame of serialized
    # tiny updates; this folds to a single fused op.
    sel = np.zeros((kw, 3, p, p), np.float32)
    for b in range(p):
        for dx in range(kw):
            idx = b + dx - 1
            a = idx % p
            dxp = (idx - a) // p + 1  # 0..2
            sel[dx, dxp, a, b] = 1
    wp = jnp.einsum(
        "kdio,dpab->kpaibo", w.astype(jnp.float32), jnp.asarray(sel, jnp.float32)
    )
    return wp.reshape(kh, 3, p * cin, p * cout).astype(w.dtype)


def _pick_pack(width: int, cin: int) -> int:
    """Largest power-of-two pack factor with p*cin <= 128 and p | width."""
    p = 1
    while (
        p < 32
        and 2 * p * cin <= 128
        and width % (2 * p) == 0
        and (width // (2 * p)) % 8 == 0
    ):
        p *= 2
    return p


@functools.partial(jax.jit, static_argnames=("relu", "block_h"))
def _conv3x3_impl(
    x: jnp.ndarray,  # [B, H, W, Cin]
    w: jnp.ndarray,  # [3, 3, Cin, Cout]
    bias: jnp.ndarray,  # [Cout]
    skip: jnp.ndarray | None = None,  # [B, H, W, Cout] residual added pre-ReLU
    relu: bool = True,
    block_h: int = 16,
) -> jnp.ndarray:
    """SAME-padded 3x3 stride-1 convolution with fused bias/skip/ReLU."""
    bsz, h, width, cin = x.shape
    cout = w.shape[-1]

    pack = _pick_pack(width, cin)
    if pack > 1:
        out = _conv3x3_impl(
            x.reshape(bsz, h, width // pack, pack * cin),
            _pack_weights(w, pack),
            jnp.tile(bias, pack),
            None if skip is None else skip.reshape(bsz, h, width // pack, pack * cout),
            relu=relu,
            block_h=block_h,
        )
        return out.reshape(bsz, h, width, cout)
    bh = block_h
    while h % bh:
        bh //= 2
    # the manual halo DMA requires 8-aligned sublane (W) and 128-aligned
    # lane (C) extents; zero-padding channels keeps the matmul exact
    wp = width + 2
    wp_pad = (-wp) % 8
    c_pad = (-cin) % 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + wp_pad), (0, c_pad)))
    if c_pad:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, c_pad), (0, 0)))
    cin_p = cin + c_pad

    grid = (bsz, h // bh)
    kernel = functools.partial(
        _kernel, bh=bh, width=width, cin=cin_p, cout=cout, relu=relu,
        has_skip=skip is not None,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # padded input, manual halo DMA
        pl.BlockSpec((3, 3, cin_p, cout), lambda b, i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [xp, w, bias[None]]
    if skip is not None:
        in_specs.append(
            pl.BlockSpec((1, bh, width, cout), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(skip)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, h, width, cout), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bh, width, cout), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, wp + wp_pad, cin_p), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=40 * 1024 * 1024,
        ),
    )(*args)


@functools.lru_cache(maxsize=None)
def _conv_vmappable(relu: bool, block_h: int, has_skip: bool):
    """``custom_vmap`` wrapper: a vmapped session axis folds into the
    kernel's batch grid dimension instead of hitting the (unsupported)
    pallas batching rule for ANY-memory-space operands — multi-session
    serving vmaps the whole frame step over stream state."""

    if has_skip:

        @jax.custom_batching.custom_vmap
        def f(x, w, bias, skip):
            return _conv3x3_impl(x, w, bias, skip, relu=relu, block_h=block_h)

    else:

        @jax.custom_batching.custom_vmap
        def f(x, w, bias):
            return _conv3x3_impl(x, w, bias, None, relu=relu, block_h=block_h)

    @f.def_vmap
    def _rule(axis_size, in_batched, x, w, bias, *rest):
        xb, wb, bb = in_batched[0], in_batched[1], in_batched[2]
        sb = in_batched[3] if rest else False
        skip = rest[0] if rest else None
        if wb or bb:
            # batched weights fall back to per-slice maps (not a serving case)
            out = jax.lax.map(
                lambda args: _conv3x3_impl(
                    args[0], args[1], args[2], args[3] if rest else None,
                    relu=relu, block_h=block_h),
                (x if xb else jnp.broadcast_to(x[None], (axis_size, *x.shape)),
                 w if wb else jnp.broadcast_to(w[None], (axis_size, *w.shape)),
                 bias if bb else jnp.broadcast_to(bias[None], (axis_size, *bias.shape)))
                + ((skip if sb else jnp.broadcast_to(skip[None], (axis_size, *skip.shape)),)
                   if rest else ()),
            )
            return out, True
        if not xb:
            x = jnp.broadcast_to(x[None], (axis_size, *x.shape))
        xf = x.reshape((-1,) + x.shape[2:])
        if rest:
            if not sb:
                skip = jnp.broadcast_to(skip[None], (axis_size, *skip.shape))
            sf = skip.reshape((-1,) + skip.shape[2:])
            out = f(xf, w, bias, sf)
        else:
            out = f(xf, w, bias)
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    return f


def conv3x3_fused(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    skip: jnp.ndarray | None = None,
    relu: bool = True,
    block_h: int = 16,
) -> jnp.ndarray:
    """Public fused conv; see ``_conv3x3_impl``. vmap-safe (session axis
    folds into the batch grid dim via ``custom_vmap``)."""
    if skip is None:
        return _conv_vmappable(relu, block_h, False)(x, w, bias)
    return _conv_vmappable(relu, block_h, True)(x, w, bias, skip)
