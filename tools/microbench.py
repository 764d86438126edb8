"""Microbenchmarks for hot-path kernels: iterate on ops without building
the whole pipeline. Run on the TPU: python tools/microbench.py conv|gn|stream
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, iters=50, warmup=5):
    """Amortized per-op time: chain `inner` dependent applications of fn
    inside ONE jitted program so tunnel dispatch overhead (~ms) vanishes."""
    import jax
    import jax.numpy as jnp

    inner = 32

    @jax.jit
    def chained(*a):
        x = a[0]
        rest = a[1:]
        probe = jax.eval_shape(fn, *a)

        def body(i, x):
            y = fn(x, *rest)
            if probe.shape == x.shape and probe.dtype == x.dtype:
                return y  # true chaining: output feeds the next input
            # feed a full reduction back so nothing can be sliced away
            return x + (y.mean() * 1e-30).astype(x.dtype)
        return jax.lax.fori_loop(0, inner, body, x)

    out = chained(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(8):
        out = chained(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (8 * inner)


def bench_conv():
    import jax
    import jax.numpy as jnp

    from live2diff_tpu.ops.conv import conv3x3_fused

    key = jax.random.PRNGKey(0)
    for (h, w, cin, cout) in [(512, 512, 64, 64), (512, 512, 3, 64),
                              (256, 256, 64, 64), (128, 128, 64, 64)]:
        x = jax.random.normal(key, (1, h, w, cin), jnp.bfloat16)
        wt = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16) * 0.05
        b = jax.random.normal(key, (cout,), jnp.bfloat16)
        skip = jax.random.normal(key, (1, h, w, cout), jnp.bfloat16)

        def ref(x, wt, b, skip):
            out = jax.lax.conv_general_dilated(
                x, wt, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ) + b.astype(jnp.float32) + skip.astype(jnp.float32)
            return jnp.maximum(out, 0).astype(x.dtype)

        jref = jax.jit(ref)
        t_ref = timeit(jref, x, wt, b, skip)
        t_ker = timeit(lambda *a: conv3x3_fused(*a, relu=True), x, wt, b, skip)
        # parity
        o1 = np.asarray(jref(x, wt, b, skip), np.float32)
        o2 = np.asarray(conv3x3_fused(x, wt, b, skip, relu=True), np.float32)
        err = np.abs(o1 - o2).max()
        gf = h * w * 9 * cin * cout * 2 / 1e9
        print(f"conv {h}x{w}x{cin}->{cout}: xla {t_ref*1e3:7.3f} ms | kernel "
              f"{t_ker*1e3:7.3f} ms ({gf/t_ker/1e3:6.1f} TF/s eff) | maxerr {err:.4f}")


def bench_gn():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    key = jax.random.PRNGKey(0)
    for (b, hw, c) in [(2, 4096, 320), (2, 1024, 640), (2, 256, 1280), (2, 64, 1280)]:
        x = jax.random.normal(key, (b, 1, hw, c), jnp.bfloat16)
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)

        gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32)
        params = gn.init(key, x)

        def flax_gn(x):
            return gn.apply(params, x).astype(x.dtype)

        def hand_gn(x):
            xf = x.astype(jnp.float32)
            s = xf.sum(axis=(1, 2))          # [b, c]
            ss = (xf * xf).sum(axis=(1, 2))  # [b, c]
            g = 32
            n = hw * (c // g)
            sg = s.reshape(b, g, c // g).sum(-1) / n       # [b, g]
            ssg = ss.reshape(b, g, c // g).sum(-1) / n
            var = ssg - sg * sg
            inv = jax.lax.rsqrt(var + 1e-5)                 # [b, g]
            scale = jnp.repeat(inv, c // g, axis=-1) * gamma     # [b, c]
            shift = beta - jnp.repeat(sg * inv, c // g, axis=-1) * gamma
            y = xf * scale[:, None, None, :] + shift[:, None, None, :]
            return y.astype(x.dtype)

        j1, j2 = jax.jit(flax_gn), jax.jit(hand_gn)
        t1, t2 = timeit(j1, x), timeit(j2, x)
        err = np.abs(np.asarray(j1(x), np.float32) - np.asarray(j2(x), np.float32)).max()
        mb = b * hw * c * 2 / 1e6
        print(f"gn [{b},{hw},{c}] ({mb:.1f} MB): flax {t1*1e3:7.3f} ms | hand "
              f"{t2*1e3:7.3f} ms | maxerr {err:.4f}")


def bench_attn():
    """Spatial flash attention layouts at the flagship UNet shapes.

    [B,H,S,D] with D=40/80 minor pads every tile to 128 lanes; the D-major
    variant puts D on sublanes (8-aligned, dense). Useful-FLOPs TF/s shown —
    multiply by 128/D for the padded-ops rate the MXU actually executes.
    """
    import jax
    import jax.numpy as jnp

    from live2diff_tpu.ops.flash_attention import (
        flash_self_attention,
        flash_self_attention_dmajor,
    )

    key = jax.random.PRNGKey(0)
    # (B, H, S, D): 64x64-latent attn (5 calls/frame) and 32x32 (steps=2)
    for (b, h, s, d) in [(2, 8, 4096, 40), (2, 8, 1024, 80)]:
        q, k, v = (
            jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
            for kk in jax.random.split(key, 3)
        )
        scale = d**-0.5

        def xla_ref(q, k, v):
            lg = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(lg, axis=-1).astype(v.dtype)
            return jnp.einsum("bhqk,bhkd->bhqd", p, v)

        ref = np.asarray(jax.jit(xla_ref)(q, k, v), np.float32)
        gf = 2 * 2 * b * h * s * s * d / 1e9  # QK + PV useful FLOPs

        rows = [("xla-dense", jax.jit(xla_ref))]
        for bq, bk in [(512, 1024), (256, 2048), (512, min(4096, s))]:
            rows.append((
                f"flash q{bq}k{bk}",
                lambda q, k, v, bq=bq, bk=bk: flash_self_attention(
                    q, k, v, scale=scale, block_q=bq, block_k=bk),
            ))
            rows.append((
                f"dmajor q{bq}k{bk}",
                lambda q, k, v, bq=bq, bk=bk: flash_self_attention_dmajor(
                    q, k, v, scale=scale, block_q=bq, block_k=bk),
            ))
        for name, fn in rows:
            try:
                out = np.asarray(fn(q, k, v), np.float32)
                err = np.abs(out - ref).max()
                t = timeit(fn, q, k, v)
            except Exception as e:  # noqa: BLE001 — report and keep sweeping
                print(f"attn [{b},{h},{s},{d}] {name:>14}: FAILED {type(e).__name__}: {e}")
                continue
            print(f"attn [{b},{h},{s},{d}] {name:>14}: {t*1e3:7.3f} ms "
                  f"({gf/t/1e3:6.1f} TF/s useful) maxerr {err:.4f}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "conv"
    {"conv": bench_conv, "gn": bench_gn, "attn": bench_attn}[which]()
