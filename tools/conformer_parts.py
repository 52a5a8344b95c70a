"""Localize the conformer bf16 pathology: per-component fwd+bwd timing.

r1/r2 history: full conformer step is ~3.6 ms f32 but ~122-148 ms bf16 on
this v5e via the axon relay, even after f32 normalization islands and an
f32 depthwise conv.  TDNN-F (also nn.Conv-based) is FASTER in bf16, so
bf16 convs are not generically broken — something conformer-specific is.
This tool times each candidate in isolation, both dtypes, with the
diffchain estimator (min(t_n2)-min(t_n1); see tools/truth_bench.py).

Usage: timeout 3000 python tools/conformer_parts.py > /tmp/conf_parts.log 2>&1
"""

import json
import pathlib
import sys
import time
from functools import partial

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

B, T, D, H, K = 64, 160, 256, 4, 15


def diffchain(fn, x0, n1=4, n2=12, reps=3):
    import jax

    y = fn(x0)
    jax.block_until_ready(y)

    def run(n):
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = fn(x)
        jax.block_until_ready(x)
        return time.perf_counter() - t0

    run(n1)
    t1s = [run(n1) for _ in range(reps)]
    t2s = [run(n2) for _ in range(reps)]
    return (min(t2s) - min(t1s)) / (n2 - n1)


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from torchain_tpu.utils.compile_cache import enable as _cc

    _cc()

    print(f"backend={jax.default_backend()}", flush=True)
    results = {}

    def bench(name, make_mod, dtype, in_shape=(B, T, D)):
        mod = make_mod(dtype)
        x0 = jnp.asarray(np.random.default_rng(0).normal(size=in_shape), dtype)
        params = mod.init(jax.random.PRNGKey(0), x0)

        @jax.jit
        def step(x):
            def loss(p, x):
                return jnp.sum(mod.apply(p, x).astype(jnp.float32) ** 2) * 1e-6

            g = jax.grad(loss, argnums=1)(params, x)
            return (x + 0.001 * g.astype(x.dtype)).astype(x.dtype)

        ms = diffchain(step, x0) * 1e3
        results[f"{name}/{jnp.dtype(dtype).name}"] = round(ms, 3)
        print(json.dumps({name: jnp.dtype(dtype).name, "ms": round(ms, 3)}), flush=True)

    class Ffn(nn.Module):
        dtype: object

        @nn.compact
        def __call__(self, x):
            h = nn.Dense(4 * D, dtype=self.dtype)(x)
            h = nn.swish(h)
            return nn.Dense(D, dtype=self.dtype)(h)

    class Attn(nn.Module):
        dtype: object

        @nn.compact
        def __call__(self, x):
            qkv = nn.Dense(3 * D, dtype=self.dtype)(x).reshape(B, T, 3, H, D // H)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            logits = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32)
            att = jnp.einsum(
                "bhts,bshd->bthd", nn.softmax(logits, axis=-1).astype(v.dtype), v
            )
            return nn.Dense(D, dtype=self.dtype)(att.reshape(B, T, D))

    class SoftmaxOnly(nn.Module):
        dtype: object

        @nn.compact
        def __call__(self, x):
            # [B,T,D] -> reshape to [B,H,T,T]-ish softmax load
            y = x @ jnp.swapaxes(x, -1, -2).astype(x.dtype)  # [B,T,T]
            return nn.softmax(y.astype(jnp.float32), axis=-1).astype(self.dtype) @ x

    class Depthwise(nn.Module):
        dtype: object

        @nn.compact
        def __call__(self, x):
            return nn.Conv(
                D, kernel_size=(K,), feature_group_count=D, padding="SAME",
                dtype=self.dtype,
            )(x.astype(self.dtype))

    class Frontend(nn.Module):
        dtype: object

        @nn.compact
        def __call__(self, x):
            return nn.Conv(
                D, kernel_size=(5,), strides=(3,), padding="VALID", dtype=self.dtype
            )(x.astype(self.dtype))

    class Glu(nn.Module):
        dtype: object

        @nn.compact
        def __call__(self, x):
            h = nn.Dense(2 * D, dtype=self.dtype)(x)
            return nn.glu(h, axis=-1)

    class LnIsland(nn.Module):
        dtype: object

        @nn.compact
        def __call__(self, x):
            for i in range(4):
                x = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
            return x

    for name, mk, shape in (
        ("ffn", Ffn, (B, T, D)),
        ("attn", Attn, (B, T, D)),
        ("softmax", SoftmaxOnly, (B, T, D)),
        ("depthwise", Depthwise, (B, T, D)),
        ("frontend", Frontend, (B, T * 3, 40)),
        ("glu", Glu, (B, T, D)),
        ("ln_island", LnIsland, (B, T, D)),
    ):
        for dtype in (jnp.float32, jnp.bfloat16):
            mod = lambda dt: mk(dtype=dt)
            try:
                bench(name, mod, dtype, in_shape=shape)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({name: str(dtype), "error": str(e)[:150]}), flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
