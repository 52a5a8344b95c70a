"""Decompose the train step's TRUE device time via scan-chaining.

Each component runs as N dependent iterations inside ONE jit (lax.scan
with a data-dependent carry), so the wall-clock of a single dispatch
bounds real device execution — no relay dispatch/future semantics
involved.  Differencing two chain lengths cancels the dispatch itself.

Components: model (fwd+bwd+adam, loss = sum of outputs), den (resident or
dense path fwd+bwd), num (supervision fwd+bwd), full (the real step).

Usage: timeout 2400 python tools/chained_parts.py --parts den num model full
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", nargs="+", default=["den", "num", "model", "full"])
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--t", type=int, default=50)
    ap.add_argument("--dtype", default="bf16", choices=("bf16", "f32"))
    ap.add_argument("--den", default="resident", choices=("resident", "dense"))
    ap.add_argument("--n1", type=int, default=4)
    ap.add_argument("--n2", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from functools import partial

    from torchain_tpu.utils.compile_cache import enable as _cc

    _cc()

    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import TDNNF, TdnnfConfig
    from torchain_tpu.ops import ChainLossOptions, DeviceDenseDenGraph
    from torchain_tpu.ops.den_resident import DeviceResidentDenGraph
    from torchain_tpu.ops import den_dense, den_resident, num_scan
    from torchain_tpu.ops.device_graphs import DeviceSupervision
    from torchain_tpu.train import create_train_state, make_train_step

    B, T_OUT, FEAT = args.b, args.t, 40
    corpus = synthetic_dataset(
        num_utts=2 * B,
        num_phones=40,
        feat_dim=FEAT,
        utt_frames_out=(T_OUT, T_OUT + 10),
        seed=0,
        lm_order=3,
        lm_extra_states=1000,
    )
    cfg = TdnnfConfig(
        num_pdfs=corpus.tree.num_pdfs,
        hidden_dim=768,
        bottleneck_dim=96,
        prefinal_dim=256,
        num_layers=9,
        dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
    )
    left, right = cfg.context
    dataset = ChainDataset(
        corpus.utts,
        corpus.tree,
        corpus.norm_fst,
        chunk_frames_out=T_OUT,
        left_context=left,
        right_context=right,
        sup_opts=SupervisionOptions(left_tolerance=2, right_tolerance=2),
    )
    batch = next(dataset.batches(B, shuffle=False))
    sup = DeviceSupervision.from_host(batch.sup)
    feats = jnp.asarray(batch.feats)
    P = corpus.tree.num_pdfs
    if args.den == "resident":
        den = DeviceResidentDenGraph.from_host(corpus.den_graph)
        den_fwd = lambda y: den_resident.den_forward(y, den, 0.1)
        den_bwd = lambda y, z, r: den_resident.den_backward(den, r, 0.1)
    else:
        den = DeviceDenseDenGraph.from_host(corpus.dense_den)
        den_fwd = lambda y: den_dense.den_forward(y, den, 0.1)
        den_bwd = lambda y, z, r: den_dense.den_backward(den, r, 0.1)

    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    step_fn = make_train_step(
        ChainLossOptions(
            l2_regularize=5e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1
        ),
        donate=False,  # timing harness replays the same state object
    )
    model = TDNNF(cfg)
    state0 = create_train_state(model, feats, tx)
    y0 = jnp.zeros((B, T_OUT, P), jnp.float32)
    print(f"backend={jax.default_backend()} dtype={args.dtype} den={args.den}", flush=True)

    def chain_den(n):
        @partial(jax.jit, static_argnums=(1,))
        def f(y, n):
            def body(y, _):
                z, res = den_fwd(y)
                gam = den_bwd(y, z, res)
                return y + 1e-6 * gam, jnp.sum(z)
            y, zs = jax.lax.scan(body, y, None, length=n)
            return zs[-1]
        return f(y0, n)

    def chain_num(n):
        @partial(jax.jit, static_argnums=(1,))
        def f(y, n):
            def body(y, _):
                lp, al = num_scan.num_forward(y, sup)
                gam = num_scan.num_backward(y, sup, lp, al)
                return y + 1e-6 * gam, jnp.sum(lp)
            y, ls = jax.lax.scan(body, y, None, length=n)
            return ls[-1]
        return f(y0, n)

    def chain_model(n):
        @partial(jax.jit, static_argnums=(2,))
        def f(state, feats, n):
            def body(st, _):
                def loss_fn(p):
                    out, xent = model.apply(
                        {"params": p, **({"batch_stats": st.batch_stats} if st.batch_stats else {})},
                        feats,
                        train=False,
                    )
                    return jnp.sum(out * out) * 1e-6 + jnp.sum(xent) * 1e-9
                loss, grads = jax.value_and_grad(loss_fn)(st.params)
                updates, opt_state = tx.update(grads, st.opt_state, st.params)
                import optax as _o
                new_params = _o.apply_updates(st.params, updates)
                return st.replace(params=new_params, opt_state=opt_state), loss
            st, losses = jax.lax.scan(body, state, None, length=n)
            return losses[-1]
        return f(state0, feats, n)

    def chain_full(n):
        @partial(jax.jit, static_argnums=(3,))
        def f(state, feats, sup, n):
            def body(st, _):
                st, metrics = step_fn(st, feats, den, sup)
                return st, metrics["loss"]
            st, losses = jax.lax.scan(body, state, None, length=n)
            return losses[-1]
        return f(state0, feats, sup, n)

    chains = dict(den=chain_den, num=chain_num, model=chain_model, full=chain_full)
    for part in args.parts:
        fn = chains[part]
        t0 = time.time()
        jax.block_until_ready(fn(args.n1))
        jax.block_until_ready(fn(args.n2))
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(args.n1))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(fn(args.n2))
            t2 = time.perf_counter() - t0
            best = min(best, (t2 - t1) / (args.n2 - args.n1))
        print(
            json.dumps(
                dict(part=part, per_iter_ms=round(best * 1e3, 3), compile_s=round(compile_s, 1))
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
