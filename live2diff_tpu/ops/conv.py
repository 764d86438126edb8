"""Pallas TPU kernels: fused 3x3 SAME convs (+bias +skip +ReLU), stride 1 & 2.

Motivation: the TAESD codec runs 3x3/64-channel convs at full 512x512
resolution per frame. XLA's conv lowering for small-batch, 64-channel NHWC
picks a space-to-depth schedule that costs ~2.9 ms per conv on v5e — ~30x
off the memory bound. These kernels stream row-bands of the input through
VMEM with an explicit halo DMA and compute the conv as shifted
[rows*W, C] x [C, Co] MXU matmuls with fp32 accumulation, fusing bias, the
residual skip, and ReLU into the same pass.

Two bandwidth tricks:

* **W-packing**: p horizontally adjacent pixels fold into the channel axis
  (a free reshape), turning C=64 into 128 full MXU lanes (see
  ``_pack_weights``).
* **In-kernel halo**: the SAME-padding halo never exists in HBM. Row halos
  come from conditionally-shaped DMAs (edge blocks zero the missing row in
  VMEM); column halos are in-register shifted copies with a zero column.
  The padded-array materialisation this replaces cost ~0.2 ms of HBM
  round-trip per full-res call.

The stride-2 variant keeps the whole TAESD encoder inside kernel-land: its
input is W-packed at 2x the output packing, so each output column reads a
3-tap window of packed input columns and the row taps are a stride-2
sublane gather of the DMA'd band.

Used by the TinyVAE (TAESD) via ``models/vae.py``; parity with ``nn.Conv``
is covered by interpret-mode tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shifted_cols(x: jnp.ndarray, dx: int, zcol: jnp.ndarray) -> jnp.ndarray:
    """x: [rows, W, C]; returns x shifted so col j holds input col j+dx-1
    (SAME-pad semantics: out-of-range columns are zero)."""
    if dx == 0:
        return jnp.concatenate([zcol, x[:, :-1]], axis=1)
    if dx == 1:
        return x
    return jnp.concatenate([x[:, 1:], zcol], axis=1)


def _load_band(x_hbm, x_vmem, sem, b, i, *, bh, nblocks, h):
    """DMA input rows [i*bh-1, i*bh+bh+1) into the [bh+2]-row scratch,
    zeroing the rows that fall outside the image (SAME padding)."""
    zrow = jnp.zeros(x_vmem.shape[1:], x_vmem.dtype)
    if nblocks == 1:
        copy = pltpu.make_async_copy(x_hbm.at[b, 0:bh], x_vmem.at[1 : bh + 1], sem)
        copy.start()
        copy.wait()
        x_vmem[0] = zrow
        x_vmem[bh + 1] = zrow
        return

    @pl.when(i == 0)
    def _first():
        copy = pltpu.make_async_copy(
            x_hbm.at[b, 0 : bh + 1], x_vmem.at[1 : bh + 2], sem
        )
        copy.start()
        copy.wait()
        x_vmem[0] = zrow

    @pl.when(i == nblocks - 1)
    def _last():
        copy = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * bh - 1, bh + 1)], x_vmem.at[0 : bh + 1], sem
        )
        copy.start()
        copy.wait()
        x_vmem[bh + 1] = zrow

    @pl.when((i > 0) & (i < nblocks - 1))
    def _mid():
        copy = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * bh - 1, bh + 2)], x_vmem, sem
        )
        copy.start()
        copy.wait()


def _kernel(x_hbm, w_ref, b_ref, *rest, bh, nblocks, h, width, cin, cout,
            relu, has_skip):
    if has_skip:
        skip_ref, o_ref, x_vmem, sem = rest
    else:
        o_ref, x_vmem, sem = rest
        skip_ref = None
    b = pl.program_id(0)
    i = pl.program_id(1)
    _load_band(x_hbm, x_vmem, sem, b, i, bh=bh, nblocks=nblocks, h=h)

    zcol = jnp.zeros((bh + 2, 1, cin), x_vmem.dtype)
    xfull = x_vmem[...]
    acc = jnp.zeros((bh * width, cout), jnp.float32)
    # shift the (sublane) width axis once per dx — the row (dy) shift is on
    # the leading dim and free — so only 2 misaligned-sublane relayouts
    # happen instead of 9
    for dx in range(3):
        xs = _shifted_cols(xfull, dx, zcol)  # [bh+2, W, Cin]
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
    # channels zero-pad to full lanes (exact: padded weights are zero);
    # packed 64-ch stages hit p*cin == 128 and skip this entirely
    c_pad = (-cin) % 128
    if c_pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, c_pad)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, c_pad), (0, 0)))
    cin_p = cin + c_pad

    nblocks = h // bh
    grid = (bsz, nblocks)
    kernel = functools.partial(
        _kernel, bh=bh, nblocks=nblocks, h=h, width=width, cin=cin_p, cout=cout,
        relu=relu, has_skip=skip is not None,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # unpadded input, manual halo DMA
        pl.BlockSpec((3, 3, cin_p, cout), lambda b, i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, w, bias[None]]
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
            pltpu.VMEM((bh + 2, width, cin_p), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=40 * 1024 * 1024,
        ),
    )(*args)


# ---------------------------------------------------------------------------
# stride-2 variant (TAESD encoder downsample)
# ---------------------------------------------------------------------------


def _pack_weights_s2(w: jnp.ndarray, p_in: int) -> jnp.ndarray:
    """Stride-2 conv weights over W-packed input (p_in per input column) and
    output packed at ``p_out = p_in // 2``.

    Output subpixel ``b`` of packed output column j is original output
    column ``p_out*j + b``, which reads original input columns
    ``2*(p_out*j + b) + dx - 1`` — all inside packed input columns
    ``j + cp - 1`` for cp in 0..2.
    """
    kh, kw, cin, cout = w.shape
    p_out = p_in // 2
    sel = np.zeros((kw, 3, p_in, p_out), np.float32)
    for b in range(p_out):
        for dx in range(kw):
            idx = 2 * b + dx - 1  # input subcolumn relative to packed col j
            a = idx % p_in
            cp = (idx - a) // p_in + 1  # 0..2
            sel[dx, cp, a, b] = 1
    wp = jnp.einsum(
        "kdio,dpab->kpaibo", w.astype(jnp.float32), jnp.asarray(sel, jnp.float32)
    )
    return wp.reshape(kh, 3, p_in * cin, p_out * cout).astype(w.dtype)


def _kernel_s2(x_hbm, w_ref, b_ref, o_ref, x_vmem, sem, *, oh, nblocks,
               wp_cols, cin, cout, relu):
    """One [oh]-output-row band of a stride-2 conv.

    x_vmem: [2*oh+2, wp_cols, cin] holding input rows [2*y0-1, 2*y0+2*oh+1);
    output rows y read scratch rows 2*(y-y0)+dy for dy in 0..2.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    rows = 2 * oh
    zrow = jnp.zeros(x_vmem.shape[1:], x_vmem.dtype)

    if nblocks == 1:
        copy = pltpu.make_async_copy(
            x_hbm.at[b, 0 : rows], x_vmem.at[1 : rows + 1], sem
        )
        copy.start()
        copy.wait()
        x_vmem[0] = zrow
        x_vmem[rows + 1] = zrow
    else:
        @pl.when(i == 0)
        def _first():
            copy = pltpu.make_async_copy(
                x_hbm.at[b, 0 : rows + 1], x_vmem.at[1 : rows + 2], sem
            )
            copy.start()
            copy.wait()
            x_vmem[0] = zrow

        @pl.when((i > 0) & (i < nblocks - 1))
        def _mid():
            copy = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(2 * i * oh - 1, rows + 2)], x_vmem, sem
            )
            copy.start()
            copy.wait()

        @pl.when(i == nblocks - 1)
        def _last():
            # the final row read is 2*(H/2-1)+1 = H-1: rows+1 rows suffice
            # (scratch row rows+1 is sliced off before any arithmetic)
            copy = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(2 * i * oh - 1, rows + 1)],
                x_vmem.at[0 : rows + 1], sem,
            )
            copy.start()
            copy.wait()

    zcol = jnp.zeros((oh, 1, cin), x_vmem.dtype)
    xfull = x_vmem[...]
    acc = jnp.zeros((oh * wp_cols, cout), jnp.float32)
    for dy in range(3):
        # stride-2 row gather: scratch rows dy, dy+2, ..., dy+2*(oh-1)
        xr = xfull[dy : dy + rows].reshape(oh, 2, wp_cols, cin)[:, 0]
        for cp in range(3):
            xs = _shifted_cols(xr, cp, zcol)  # [oh, Wp, cin]
            acc = acc + jnp.dot(
                xs.reshape(oh * wp_cols, cin), w_ref[dy, cp],
                preferred_element_type=jnp.float32,
            )
    acc = acc + b_ref[0].astype(jnp.float32)
    out = acc.reshape(oh, wp_cols, cout)
    if relu:
        out = jnp.maximum(out, 0.0)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu", "block_h"))
def _conv3x3_s2_impl(
    x: jnp.ndarray,  # [B, H, W, Cin]; H, W even
    w: jnp.ndarray,  # [3, 3, Cin, Cout]
    bias: jnp.ndarray,  # [Cout]
    relu: bool = False,
    block_h: int = 16,
) -> jnp.ndarray:
    """3x3 stride-2 convolution, SAME padding=1 (out = H/2 x W/2)."""
    bsz, h, width, cin = x.shape
    cout = w.shape[-1]
    assert h % 2 == 0 and width % 2 == 0, (h, width)
    oh_total, ow_total = h // 2, width // 2

    # W-pack the input at 2x the output packing; p_in >= 2 always (stride)
    p_in = 2
    while (
        p_in < 32
        and 2 * p_in * cin <= 128
        and width % (2 * p_in) == 0
        and (width // (2 * p_in)) % 8 == 0
    ):
        p_in *= 2
    p_out = p_in // 2
    wp_cols = width // p_in  # packed input cols == packed output cols

    cin_p = p_in * cin
    c_pad = (-cin_p) % 128
    xp = x.reshape(bsz, h, wp_cols, cin_p)
    wpk = _pack_weights_s2(w, p_in)
    bpk = jnp.tile(bias, p_out)
    if c_pad:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, c_pad)))
        wpk = jnp.pad(wpk, ((0, 0), (0, 0), (0, c_pad), (0, 0)))
        cin_p += c_pad
    cout_p = p_out * cout

    oh = block_h
    while oh_total % oh:
        oh //= 2
    nblocks = oh_total // oh
    grid = (bsz, nblocks)
    kernel = functools.partial(
        _kernel_s2, oh=oh, nblocks=nblocks, wp_cols=wp_cols, cin=cin_p,
        cout=cout_p, relu=relu,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, oh_total, wp_cols, cout_p), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # packed input, manual halo DMA
            pl.BlockSpec((3, 3, cin_p, cout_p), lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout_p), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, oh, wp_cols, cout_p), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * oh + 2, wp_cols, cin_p), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=40 * 1024 * 1024,
        ),
    )(xp, wpk, bpk[None])
    return out.reshape(bsz, oh_total, ow_total, cout)


# ---------------------------------------------------------------------------
# vmap-safe public wrappers
# ---------------------------------------------------------------------------


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


@functools.lru_cache(maxsize=None)
def _conv_s2_vmappable(relu: bool, block_h: int):
    @jax.custom_batching.custom_vmap
    def f(x, w, bias):
        return _conv3x3_s2_impl(x, w, bias, relu=relu, block_h=block_h)

    @f.def_vmap
    def _rule(axis_size, in_batched, x, w, bias):
        xb, wb, bb = in_batched
        if wb or bb:
            out = jax.lax.map(
                lambda args: _conv3x3_s2_impl(*args, relu=relu, block_h=block_h),
                (x if xb else jnp.broadcast_to(x[None], (axis_size, *x.shape)),
                 w if wb else jnp.broadcast_to(w[None], (axis_size, *w.shape)),
                 bias if bb else jnp.broadcast_to(bias[None], (axis_size, *bias.shape))),
            )
            return out, True
        if not xb:
            x = jnp.broadcast_to(x[None], (axis_size, *x.shape))
        xf = x.reshape((-1,) + x.shape[2:])
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
    """Public fused stride-1 conv; see ``_conv3x3_impl``. vmap-safe (session
    axis folds into the batch grid dim via ``custom_vmap``)."""
    if skip is None:
        return _conv_vmappable(relu, block_h, False)(x, w, bias)
    return _conv_vmappable(relu, block_h, True)(x, w, bias, skip)


def conv3x3_s2_fused(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    relu: bool = False,
    block_h: int = 16,
) -> jnp.ndarray:
    """Public fused stride-2 SAME conv (out H/2 x W/2); vmap-safe."""
    return _conv_s2_vmappable(relu, block_h)(x, w, bias)
