"""Posterior export tool (SURVEY.md section 3.4 standalone flow).

Loads a trainer checkpoint, runs the chain-head forward over utterances,
and writes per-utterance pseudo-loglike matrices to a Kaldi TEXT archive
(`ark,t:` compatible) — the role torchain's matrix writer + example loop
played before shelling out to latgen-faster-mapped.  The output decodes
with either this repo's Viterbi/lattice decoders or external Kaldi.

Usage (synthetic demo):
  python -m torchain_tpu.cli.export_posteriors --synthetic \
      --checkpoint-dir ckpts --out posts.ark
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--num-utts", type=int, default=16)
    p.add_argument("--num-phones", type=int, default=8)
    p.add_argument("--feat-dim", type=int, default=24)
    p.add_argument("--model", choices=("tdnn", "tdnnf", "conformer"), default="tdnnf")
    p.add_argument("--hidden-dim", type=int, default=256)
    p.add_argument("--bottleneck-dim", type=int, default=64)
    p.add_argument("--num-layers", type=int, default=5)
    p.add_argument("--checkpoint-dir", default=None, help="trainer checkpoint to load")
    p.add_argument("--out", required=True, help="output text-ark path")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if not args.synthetic:
        print("only --synthetic corpora are wired up in-round", file=sys.stderr)
        return 2

    import jax.numpy as jnp
    import optax

    from torchain_tpu.data import synthetic_dataset
    from torchain_tpu.io import MatrixWriter
    from torchain_tpu.models import TDNN, TDNNF, Conformer, ConformerConfig, TdnnConfig, TdnnfConfig
    from torchain_tpu.train import create_train_state
    from torchain_tpu.train.step import make_forward_fn

    corpus = synthetic_dataset(
        num_utts=args.num_utts,
        num_phones=args.num_phones,
        feat_dim=args.feat_dim,
        seed=args.seed,
    )
    if args.model == "tdnn":
        cfg = TdnnConfig(num_pdfs=corpus.tree.num_pdfs, hidden_dim=args.hidden_dim)
        model = TDNN(cfg)
    elif args.model == "tdnnf":
        cfg = TdnnfConfig(
            num_pdfs=corpus.tree.num_pdfs,
            hidden_dim=args.hidden_dim,
            bottleneck_dim=args.bottleneck_dim,
            num_layers=args.num_layers,
        )
        model = TDNNF(cfg)
    else:
        cfg = ConformerConfig(
            num_pdfs=corpus.tree.num_pdfs, dim=args.hidden_dim,
            num_layers=args.num_layers,
        )
        model = Conformer(cfg)
    left, right = cfg.context
    fsf = cfg.frame_subsampling_factor
    t_in = 20 * fsf + left + right
    state = create_train_state(
        model, jnp.zeros((1, t_in, args.feat_dim)), optax.sgd(0.0)
    )
    if args.checkpoint_dir:
        from torchain_tpu.ops import auto_den_graph
        from torchain_tpu.train import Trainer, TrainerConfig

        trainer = Trainer(
            model,
            auto_den_graph(corpus.den_graph),
            TrainerConfig(checkpoint_dir=args.checkpoint_dir),
            np.zeros((1, t_in, args.feat_dim), np.float32),
        )
        if not trainer.restore_checkpoint():
            print("no checkpoint found; exporting with random init", file=sys.stderr)
        state = trainer.state

    forward = make_forward_fn(model)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    n = 0
    with MatrixWriter(args.out) as w:
        for utt in corpus.utts:
            T_in_utt = utt.feats.shape[0]
            t_out = T_in_utt // fsf
            idx = np.clip(np.arange(-left, t_out * fsf + right), 0, T_in_utt - 1)
            y = np.asarray(forward(variables, jnp.asarray(utt.feats[idx][None])))[0]
            w[utt.utt_id] = y
            n += 1
    print(f"wrote {n} posterior matrices to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
