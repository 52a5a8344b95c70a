"""Denominator-path shootout at production scale: de Bruijn lift vs sparse
segment scan, on the real chip.

Measures den fwd+bwd only (the VERDICT r1 perf frontier), at two graph
scales:
  * trigram 40-phone left-biphone (r1 bench headline scale)
  * 4-gram 40-phone left-biphone (Kaldi production scale, S>=3.4k states)

Usage: timeout 590 python tools/bench_debruijn.py [--skip-sparse] [--b N]
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def measure(fn, *args, warmup=2, windows=4, iters=8):
    import jax

    from torchain_tpu.utils.compile_cache import enable as _cc
    _cc()

    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--t", type=int, default=50)
    ap.add_argument("--phones", type=int, default=40)
    ap.add_argument("--orders", type=int, nargs="+", default=[3, 4])
    ap.add_argument("--skip-sparse", action="store_true")
    ap.add_argument("--skip-debruijn", action="store_true")
    ap.add_argument("--resident", action="store_true", help="bench the VMEM-resident Pallas path")
    ap.add_argument("--leaky", type=float, default=0.1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from torchain_tpu.graphs import (
        ContextTree,
        PhoneLmOptions,
        compile_den_graph,
        estimate_phone_lm,
        make_debruijn_den_graph,
        make_den_fst,
    )
    from torchain_tpu.ops import DeviceDeBruijnDenGraph, DeviceDenGraph
    from torchain_tpu.ops import den_debruijn, den_scan

    print(f"backend={jax.default_backend()} devices={len(jax.devices())}", flush=True)
    rng = np.random.default_rng(0)
    sents = [
        list(map(int, rng.integers(1, args.phones + 1, size=rng.integers(5, 15))))
        for _ in range(3000)
    ]
    tree = ContextTree(args.phones, context_width=2)
    B, T, P = args.b, args.t, tree.num_pdfs
    y = jnp.asarray((rng.normal(size=(B, T, P)) * 0.7).astype(np.float32))
    leaky = args.leaky

    for order in args.orders:
        extra = 1000 if order == 3 else 2000
        lm = estimate_phone_lm(
            sents, PhoneLmOptions(ngram_order=order, num_extra_lm_states=extra)
        )
        t0 = time.time()
        if not args.skip_debruijn:
            dbj = make_debruijn_den_graph(lm, tree)
            print(
                f"order={order}: lm_states={lm.num_states} C={dbj.num_contexts} "
                f"W3={dbj.W3.nbytes/1e6:.1f}MB compile={time.time()-t0:.1f}s",
                flush=True,
            )
            g = DeviceDeBruijnDenGraph.from_host(dbj)

            @jax.jit
            def dbj_fb(y, g=g):
                z, res = den_debruijn.den_forward(y, g, leaky)
                gam = den_debruijn.den_backward(y, g, z, res, leaky)
                return z, gam

            dt = measure(dbj_fb, y)
            print(f"  debruijn fwd+bwd: {dt*1e3:.2f} ms", flush=True)
        if not args.skip_sparse or args.resident:
            t0 = time.time()
            den_fst = make_den_fst(lm, tree)
            graph = compile_den_graph(den_fst, P)
            print(
                f"  fst: S={graph.num_states} A={graph.num_arcs} "
                f"compile={time.time()-t0:.1f}s",
                flush=True,
            )
            gs = DeviceDenGraph.from_host(graph)

            @jax.jit
            def scan_fb(y, gs=gs):
                z, alphas = den_scan.den_forward(y, gs, leaky)
                gam = den_scan.den_backward(y, gs, z, alphas, leaky)
                return z, gam

            if not args.skip_sparse:
                dt = measure(scan_fb, y)
                print(f"  sparse scan fwd+bwd: {dt*1e3:.2f} ms", flush=True)
                if not args.skip_debruijn:
                    z1, g1 = dbj_fb(y)
                    z2, g2 = scan_fb(y)
                    dz = float(jnp.max(jnp.abs(z1 - z2)))
                    dg = float(jnp.max(jnp.abs(g1 - g2)))
                    print(f"  agreement: max|dlogZ|={dz:.2e} max|dgamma|={dg:.2e}", flush=True)
            if args.resident:
                from torchain_tpu.ops import den_resident
                from torchain_tpu.ops.den_resident import DeviceResidentDenGraph

                t0 = time.time()
                gr = DeviceResidentDenGraph.from_host(graph)
                print(
                    f"  resident: S_pad={gr.num_states} K={gr.num_slots} "
                    f"V={gr.vmem_bytes/1e6:.1f}MB dtype={gr.V.dtype} "
                    f"pack={time.time()-t0:.1f}s",
                    flush=True,
                )

                @jax.jit
                def res_fb(y, gr=gr):
                    z, res = den_resident.den_forward(y, gr, leaky)
                    gam = den_resident.den_backward(gr, res, leaky)
                    return z, gam

                dt = measure(res_fb, y)
                print(f"  resident fwd+bwd: {dt*1e3:.2f} ms", flush=True)
                z1, g1 = res_fb(y)
                z2, g2 = scan_fb(y)
                dz = float(jnp.max(jnp.abs(z1 - z2)))
                dg = float(jnp.max(jnp.abs(g1 - g2)))
                print(
                    f"  resident vs scan: max|dlogZ|={dz:.2e} max|dgamma|={dg:.2e}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
