"""Microbench: fused FFN kernel vs XLA reference, fwd and fwd+bwd, at
the conformer trigram shapes (N=6400, D=256, F=1024, bf16).

Usage: timeout 1800 python tools/ab_ffn_micro.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def bench(fn, *args, iters=50):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from torchain_tpu.utils.compile_cache import enable as _cc

    _cc()
    from torchain_tpu.ops import fused_ffn

    N, D, F = 6400, 256, 1024
    rng = np.random.default_rng(0)
    xn = jnp.asarray(rng.standard_normal((N, D)), jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((N, D)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((D, F)) * 0.05, jnp.float32)
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((F, D)) * 0.05, jnp.float32)
    b2 = jnp.zeros((D,), jnp.float32)
    g = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)

    fused_f = jax.jit(
        lambda *a: fused_ffn._ffn_fused(*a, 0.5, False)
    )
    ref_f = jax.jit(lambda *a: fused_ffn.ffn_reference(*a, 0.5))

    def make_grad(core):
        def loss(xn, res, w1, b1, w2, b2):
            return jnp.sum(core(xn, res, w1, b1, w2, b2).astype(jnp.float32) * g)

        return jax.jit(jax.grad(loss, argnums=(0, 2, 3, 4, 5)))

    fused_g = make_grad(lambda *a: fused_ffn._ffn_fused(*a, 0.5, False))
    ref_g = make_grad(lambda *a: fused_ffn.ffn_reference(*a, 0.5))

    args = (xn, res, w1, b1, w2, b2)
    out = {
        "fwd_fused_ms": round(bench(fused_f, *args), 4),
        "fwd_ref_ms": round(bench(ref_f, *args), 4),
        "grad_fused_ms": round(bench(fused_g, *args), 4),
        "grad_ref_ms": round(bench(ref_g, *args), 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
