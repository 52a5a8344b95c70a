"""bf16-V end-to-end accuracy A/B (VERDICT r2 item 5).

Trains the production-scale synthetic harness (4-gram pruned LM,
left-biphone tied tree, S~3.9k) twice with identical data/seeds/model
init and compares:
  * objf curves (per-log-interval chain objf)
  * final decode PER

A: DeviceResidentDenGraph — V in bf16 (the headline path at this scale)
B: DeviceDenGraph sparse scan — exact f32 denominator (the fallback the
   framework uses when the resident kernel is unavailable)

Decision gate (BENCH_NOTES): |PER_A - PER_B| <= 0.1% absolute keeps
bf16-V as the default; otherwise the default flips to f32-chunked.

Usage: timeout 3000 python tools/ab_bf16v.py [--epochs 25] [--batch 128]
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--num-utts", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-3)
    args = ap.parse_args()

    import jax.numpy as jnp

    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.eval import make_decoding_graph, viterbi_decode, wer
    from torchain_tpu.graphs import (
        PhoneLmOptions,
        SupervisionOptions,
        estimate_phone_lm,
    )
    from torchain_tpu.models import TDNNF, TdnnfConfig
    from torchain_tpu.ops import (
        ChainLossOptions,
        DeviceDenGraph,
        DeviceResidentDenGraph,
    )
    from torchain_tpu.train import Trainer, TrainerConfig
    from torchain_tpu.train.step import make_forward_fn

    T_OUT = 50
    corpus = synthetic_dataset(
        num_utts=args.num_utts,
        num_phones=40,
        feat_dim=40,
        utt_frames_out=(T_OUT, T_OUT + 10),
        seed=0,
        context_width=2,
        lm_order=4,
        lm_extra_states=2000,
    )
    cfg = TdnnfConfig(
        num_pdfs=corpus.tree.num_pdfs,
        hidden_dim=768,
        bottleneck_dim=96,
        prefinal_dim=256,
        num_layers=9,
        dtype=jnp.bfloat16,
    )
    left, right = cfg.context
    fsf = cfg.frame_subsampling_factor

    dens = {
        "bf16_resident": DeviceResidentDenGraph.from_host(corpus.den_graph),
        "f32_scan": DeviceDenGraph.from_host(corpus.den_graph),
    }
    v_dtype = str(dens["bf16_resident"].V.dtype)
    out = {"v_dtype_resident": v_dtype, "S": corpus.den_graph.num_states}

    for tag, den in dens.items():
        dataset = ChainDataset(
            corpus.utts,
            corpus.tree,
            corpus.norm_fst,
            chunk_frames_out=T_OUT,
            left_context=left,
            right_context=right,
            sup_opts=SupervisionOptions(left_tolerance=2, right_tolerance=2),
            seed=0,
        )
        model = TDNNF(cfg)
        tcfg = TrainerConfig(
            lr=args.lr,
            num_epochs=args.epochs,
            batch_size=args.batch,
            log_every=10,
            loss=ChainLossOptions(
                l2_regularize=5e-4,
                leaky_hmm_coefficient=0.1,
                xent_regularize=0.1,
            ),
        )
        t_in = T_OUT * fsf + left + right
        trainer = Trainer(
            model, den, tcfg, np.zeros((2, t_in, 40), np.float32)
        )
        results = trainer.fit(dataset, log_fn=lambda s: None)
        curve = [round(m["objf"], 5) for m in trainer.metrics_log]

        # decode PER with a bigram LM over the training alignments
        refs = [[p for p, _ in u.alignment] for u in corpus.utts[:48]]
        lm = estimate_phone_lm(
            [[p for p, _ in u.alignment] for u in corpus.utts],
            PhoneLmOptions(ngram_order=2, num_extra_lm_states=500),
        )
        dgraph = make_decoding_graph(lm, corpus.tree)
        forward = make_forward_fn(model)
        variables = {"params": trainer.state.params}
        if trainer.state.batch_stats:
            variables["batch_stats"] = trainer.state.batch_stats
        hyps = []
        for u in corpus.utts[:48]:
            T_in_utt = u.feats.shape[0]
            t_out = T_in_utt // fsf
            idx = np.clip(np.arange(-left, t_out * fsf + right), 0, T_in_utt - 1)
            y = np.asarray(forward(variables, jnp.asarray(u.feats[idx][None])))[0]
            hyp, _ = viterbi_decode(dgraph, y, beam=16.0)
            hyps.append(hyp)
        score = wer(refs, hyps)
        out[tag] = {
            "den_path": type(den).__name__,
            "final_objf": round(results.objf, 5),
            "per": round(score["wer"], 3),
            "objf_curve": curve,
        }
        print(f"[{tag}] objf={results.objf:.5f} PER={score['wer']:.3f}%")

    delta = abs(out["bf16_resident"]["per"] - out["f32_scan"]["per"])
    out["per_delta_abs"] = round(delta, 3)
    out["gate_0p1pct"] = bool(delta <= 0.1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
