"""Device-time microbench via XPlane trace: the tunnel's wall clock lies for
small programs (service-side result memoization makes repeat executions of
identical (executable, args) pairs ~free), so per-op timing must come from
hardware trace events.

Usage: python tools/op_trace.py conv|convs2|flash|flash_int8
"""

from __future__ import annotations

import collections
import glob
import os
import sys

sys.path.insert(0, ".")


def device_op_times(fn, args, iters=16, outdir="/tmp/op_trace"):
    """Chain fn(x, *rest) iters times INSIDE one jitted program under the
    profiler; return {op: ms/iter}. The chain (each iteration's input folds
    in a reduction of the previous output) defeats both XLA dead-code
    elimination and the tunnel's identical-execution memoization."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(x, *rest):
        def body(i, x):
            y = fn(x, *rest)
            return x + (jnp.real(y).sum() * 1e-30).astype(x.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    out = chained(*args)
    jax.block_until_ready(out)
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        out = chained(*args)
        jax.block_until_ready(out)
    paths = sorted(
        glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    assert paths, f"no xplane.pb under {outdir}"
    pd = jax.profiler.ProfileData.from_file(paths[-1])
    per_op = collections.Counter()
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                key = ev.name.split(" = ")[0].lstrip("%").rsplit(".", 1)[0]
                per_op[key] += ev.duration_ns
    return {k: v / 1e6 / iters for k, v in per_op.items()}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "conv"
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)

    if mode in ("conv", "convs2"):
        from live2diff_tpu.ops.conv import conv3x3_fused, conv3x3_s2_fused

        for (bsz, h, w, c) in [(2, 512, 512, 64), (1, 512, 512, 64),
                               (2, 256, 256, 64)]:
            x = jax.random.normal(key, (bsz, h, w, c), jnp.bfloat16)
            wt = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.05
            b = jax.random.normal(key, (c,), jnp.bfloat16)
            skip = jax.random.normal(key, (bsz, h, w, c), jnp.bfloat16)
            if mode == "conv":
                f = jax.jit(lambda x, wt, b, skip: conv3x3_fused(
                    x, wt, b, skip=skip, relu=True))
                times = device_op_times(f, (x, wt, b, skip))
            else:
                f = jax.jit(lambda x, wt, b: conv3x3_s2_fused(x, wt, b))
                times = device_op_times(f, (x, wt, b))
            total = sum(times.values())
            tops = sorted(times.items(), key=lambda kv: -kv[1])[:4]
            print(f"{mode} {(bsz, h, w, c)}: total {total:.3f} ms | " +
                  " | ".join(f"{k} {v:.3f}" for k, v in tops), flush=True)

    elif mode.startswith("flash"):
        from live2diff_tpu.ops.flash_attention import (
            flash_self_attention, flash_self_attention_dmajor,
            flash_self_attention_int8)

        for (bsz, heads, s, d) in [(2, 8, 4096, 40), (2, 8, 1024, 80)]:
            q = jax.random.normal(key, (bsz, heads, s, d), jnp.bfloat16)
            k = jax.random.normal(key, (bsz, heads, s, d), jnp.bfloat16)
            v = jax.random.normal(key, (bsz, heads, s, d), jnp.bfloat16)
            for name, f in (
                ("dmajor", jax.jit(lambda q, k, v: flash_self_attention_dmajor(
                    q, k, v, scale=d**-0.5, block_k=min(s, 4096)))),
                ("int8", jax.jit(lambda q, k, v: flash_self_attention_int8(
                    q, k, v, scale=d**-0.5, block_k=min(s, 4096)))),
                ("smajor", jax.jit(lambda q, k, v: flash_self_attention(
                    q, k, v, scale=d**-0.5))),
            ):
                times = device_op_times(f, (q, k, v))
                total = sum(times.values())
                print(f"{name} {(bsz, heads, s, d)}: total {total:.3f} ms",
                      flush=True)


if __name__ == "__main__":
    main()
