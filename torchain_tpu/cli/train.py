"""End-to-end chain training recipe driver.

Parity target: torchain's example/train.py CLI ([R] example/, SURVEY.md
sections 2.1 and 3.1) — argparse flags mirroring ChainTrainingOptions
(l2-regularize, leaky-hmm-coefficient, xent-regularize, lr), staged
execution (prepare -> train -> decode -> score), per-interval ChainResults
logging, checkpointing — rebuilt over the TPU stack.  With --synthetic the
recipe is fully self-contained (no external corpus needed).

Usage:
  python -m torchain_tpu.cli.train --synthetic --steps 200 --decode
  python -m torchain_tpu.cli.train --synthetic --model tdnnf --epochs 4
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--synthetic", action="store_true", help="use the built-in synthetic corpus")
    p.add_argument("--num-utts", type=int, default=64)
    p.add_argument("--num-phones", type=int, default=12)
    p.add_argument("--feat-dim", type=int, default=24)
    p.add_argument("--context-width", type=int, default=1, choices=(1, 2))
    p.add_argument(
        "--model",
        choices=("tdnn", "tdnnf", "tdnn-lstm", "cnn-tdnn", "conformer"),
        default="tdnnf",
    )
    p.add_argument(
        "--cegs",
        help="train DIRECTLY from merged Kaldi cegs archives (comma-"
        "separated paths/globs) — the reference example workflow "
        "(completed Kaldi chain prep; [R] example/train.py + src/io.cc); "
        "requires --den-fst.  Normalization is already composed into the "
        "egs by nnet3-chain-get-egs, so no corpus/tree stages run",
    )
    p.add_argument(
        "--den-fst",
        help="with --cegs: the denominator FST (binary OpenFst or text)",
    )
    p.add_argument(
        "--num-pdfs", type=int, default=0,
        help="with --cegs: output dim (default: the egs' label_dim)",
    )
    p.add_argument(
        "--no-ivector", action="store_true",
        help="with --cegs: ignore the egs' ivector io",
    )
    p.add_argument(
        "--ignore-deriv-weights",
        action="store_true",
        help="with --cegs: treat non-uniform deriv_weights as 1.0 "
        "(default: apply them as per-frame derivative row scales, "
        "Kaldi ApplyDerivWeights semantics)",
    )
    p.add_argument("--hidden-dim", type=int, default=256)
    p.add_argument("--bottleneck-dim", type=int, default=64)
    p.add_argument("--num-layers", type=int, default=5)
    p.add_argument("--chunk-frames", type=int, default=30, help="output-rate chunk size")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument(
        "--grad-accum-steps", type=int, default=1,
        help="accumulate gradients over N micro-batches per optimizer "
        "update (effective batch = N * batch-size)",
    )
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument(
        "--lr-final", type=float, default=0.0,
        help="exponential LR decay from --lr to this value over the run "
        "(Kaldi nnet3 train.py initial/final-effective-lrate schedule)",
    )
    p.add_argument(
        "--combine-last", type=int, default=0,
        help="after training, average the params of the last N checkpoints "
        "(Kaldi 'combine' stage); requires --checkpoint-dir",
    )
    p.add_argument(
        "--optimizer", choices=("adam", "adam-lowmem", "sgd", "ngsgd"),
        default="adam"
    )
    p.add_argument(
        "--ivector-dim",
        type=int,
        default=0,
        help="train an online iVector extractor on the training utterances "
        "and append iVectors to the features (Kaldi online-ivector stages; "
        "0 = off)",
    )
    p.add_argument("--ivector-gauss", type=int, default=32)
    p.add_argument(
        "--dropout-schedule",
        default="",
        help="Kaldi --trainer.dropout-schedule, e.g. '0,0@0.20,0.5@0.50,0' "
        "(continuous per-dim dropout; '' = off)",
    )
    p.add_argument(
        "--frame-shift-cycle",
        action="store_true",
        help="cycle the input frame shift 0..fsf-1 across epochs (Kaldi "
        "frame-shift egs augmentation)",
    )
    p.add_argument(
        "--max-param-change", type=float, default=0.0,
        help="cap the global parameter update 2-norm per step (Kaldi "
        "--trainer.max-param-change; recipe default 2.0; 0 = off)",
    )
    p.add_argument(
        "--max-change-per-component", type=float, default=0.0,
        help="cap each component's update 2-norm per step (Kaldi "
        "max-change; recipe default 0.75; 0 = off)",
    )
    p.add_argument(
        "--backstitch-scale", type=float, default=0.0,
        help="Kaldi --trainer.backstitch-training-scale (e.g. 0.3; 0 = off)",
    )
    p.add_argument("--backstitch-interval", type=int, default=1)
    p.add_argument(
        "--save-egs", default="", metavar="PATH",
        help="after (pre)compiling, write all chunk supervisions to a .npz "
        "archive (nnet3-chain-get-egs archive role: prep once, train many)",
    )
    p.add_argument(
        "--load-egs", default="", metavar="PATH",
        help="load a --save-egs archive instead of compiling supervisions "
        "(refuses archives whose corpus/tree/options fingerprint differs)",
    )
    p.add_argument(
        "--materialize-egs", nargs="?", const="ram", choices=("ram", "device"),
        default="",
        help="materialize all merged minibatches once and replay them per "
        "epoch (the Kaldi merged-cegs-archive economics; "
        "data/materialize.py).  'ram' (default when the flag is bare) "
        "keeps host numpy and removes per-epoch pad/stack cost; 'device' "
        "places every batch in HBM once, removing per-step H2D traffic "
        "too (corpus must fit HBM).  Incompatible with "
        "--frame-shift-cycle",
    )
    p.add_argument(
        "--precompile-egs", type=int, default=0, metavar="WORKERS",
        help="compile all chunk supervisions up-front in N parallel worker "
        "processes (nnet3-chain-get-egs offline-prep role); they are "
        "cached across epochs either way",
    )
    p.add_argument("--l2-regularize", type=float, default=5e-4)
    p.add_argument("--leaky-hmm-coefficient", type=float, default=0.1)
    p.add_argument("--xent-regularize", type=float, default=0.1)
    p.add_argument("--left-tolerance", type=int, default=2)
    p.add_argument("--right-tolerance", type=int, default=2)
    p.add_argument(
        "--e2e",
        action="store_true",
        help="flat-start: train from transcripts only (no alignments)",
    )
    p.add_argument(
        "--flat-start-ladder",
        action="store_true",
        help="two-stage recipe: e2e flat-start training, then force-align "
        "with the stage-1 model and continue with tolerance-lattice "
        "supervision on the generated alignments",
    )
    p.add_argument("--semi-ortho-every", type=int, default=4)
    p.add_argument("--data-parallel", type=int, default=-1)
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--metrics-out", default=None)
    p.add_argument("--decode", action="store_true", help="decode + score after training")
    p.add_argument(
        "--valid-utts",
        type=int,
        default=0,
        help="hold out the last N utterances and report validation objf "
        "(nnet3-chain-compute-prob parity)",
    )
    p.add_argument("--decode-beam", type=float, default=16.0)
    # score.sh LMWT sweep for the word decode stage (0 = plain best path)
    p.add_argument("--lmwt-min", type=int, default=0)
    p.add_argument("--lmwt-max", type=int, default=0)
    p.add_argument(
        "--phone-insertion-bonus",
        type=float,
        default=0.0,
        help="added to phone-emitting arcs at decode time (counters "
        "deletion-heavy error patterns; Kaldi insertion-penalty role)",
    )
    p.add_argument(
        "--synthetic-words",
        action="store_true",
        help="word-level synthetic corpus: sentences are word sequences "
        "expanded through a random lexicon; --decode then also builds the "
        "word HCLG and reports word WER (latgen-faster-mapped role)",
    )
    p.add_argument("--vocab-size", type=int, default=20)
    p.add_argument("--word-lm-order", type=int, default=2)
    p.add_argument(
        "--tied-tree-pdfs",
        type=int,
        default=0,
        help="build a data-driven TIED tree from the corpus alignments with "
        "this pdf budget (Kaldi build-tree role) and train/decode with it; "
        "0 keeps the enumerated ContextTree",
    )
    p.add_argument(
        "--tied-tree-context",
        choices=("left", "triphone"),
        default="left",
        help="context window of the tied tree (triphone enables the "
        "delayed-emission right-context graph expansion)",
    )
    p.add_argument(
        "--wav-dir",
        default="",
        help="train from a RAW-AUDIO Kaldi data dir (wav.scp [+segments] "
        "[+utt2spk], ali.txt; text/lexicon/words.txt enable the word "
        "decode stage) — the real-corpus front; see data/synth_wav.py "
        "for a self-contained generator",
    )
    p.add_argument(
        "--cmvn",
        choices=("none", "speaker", "utterance"),
        default="speaker",
        help="feature normalization for --wav-dir (apply-cmvn role; "
        "'speaker' uses utt2spk / cmvn stats)",
    )
    p.add_argument(
        "--speed-perturb",
        action="store_true",
        help="3-way 0.9/1.0/1.1 speed perturbation at the wav front "
        "(perturb_data_dir_speed_3way.sh role; --wav-dir only)",
    )
    p.add_argument(
        "--mbr",
        action="store_true",
        help="decode stage also reports MBR (sausage) word WER at the "
        "swept best LMWT (lattice-mbr-decode role; needs --lmwt sweep)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--steps", type=int, default=0, help="stop after N steps (0 = run epochs)")
    p.add_argument(
        "--distributed",
        action="store_true",
        help="multi-host: call jax.distributed.initialize() (reads the "
        "standard coordinator env vars / TPU metadata) and shard the "
        "utterance list across hosts",
    )
    return p


def cegs_setup(args, tag: str = "cegs"):
    """Shared --cegs setup (also used by cli.compute_prob): dataset,
    compiled den graph, model, den device form, and the trainer example
    input — one source of truth for the train/score pairing."""
    import numpy as np

    from torchain_tpu.cli.graphs import _load_any_fst
    from torchain_tpu.data import CegsDataset
    from torchain_tpu.graphs.den_graph import compile_den_graph
    from torchain_tpu.ops import auto_den_graph

    if not args.den_fst:
        raise SystemExit("--cegs needs --den-fst")
    dataset = CegsDataset(
        args.cegs,
        append_ivector=not args.no_ivector,
        seed=args.seed,
        ignore_deriv_weights=getattr(args, "ignore_deriv_weights", False),
    )
    feat_dim, label_dim, bsz, t_out = dataset.peek()
    num_pdfs = args.num_pdfs or label_dim
    den_fst, fmt, _arct = _load_any_fst(args.den_fst)
    graph = compile_den_graph(den_fst, num_pdfs)
    print(
        f"[{tag}] {len(dataset.paths)} archive(s); merged batch={bsz} "
        f"t_out={t_out} feat_dim={feat_dim}; den.fst ({fmt}) "
        f"S={graph.num_states} A={graph.num_arcs} P={num_pdfs}"
    )
    model, _cfg = _build_model(args, num_pdfs, feat_dim)
    den = auto_den_graph(
        graph,
        batch_hint=bsz,
        data_shards=getattr(args, "data_parallel", 1),
    )
    print(f"[{tag}] den path: {type(den).__name__}")
    # T_in from the archives themselves (context is baked into the egs)
    first = next(dataset.batches(bsz, shuffle=False, epoch=0))
    example = np.zeros((2,) + first.feats.shape[1:], np.float32)
    return dict(
        dataset=dataset,
        graph=graph,
        model=model,
        den=den,
        example=example,
        bsz=bsz,
        t_out=t_out,
        feat_dim=feat_dim,
        num_pdfs=num_pdfs,
    )


def _train_from_cegs(args) -> dict:
    """Train from a COMPLETED Kaldi chain prep: merged cegs archives +
    den.fst — the reference's own example workflow ([R] example/train.py
    iterating src/io.cc's ExampleReader over merged cegs; SURVEY.md §2.1
    example-recipe row).  nnet3-chain-get-egs composed the normalization
    FST into the egs' supervision weights, so den.fst + egs are the
    complete training inputs; no corpus/tree/alignment stage runs."""
    import json as _json

    from torchain_tpu.ops import ChainLossOptions
    from torchain_tpu.parallel import MeshConfig
    from torchain_tpu.train import Trainer, TrainerConfig

    t0 = time.time()
    setup = cegs_setup(args)
    dataset, model, den = setup["dataset"], setup["model"], setup["den"]
    bsz = setup["bsz"]

    decay_steps = 0
    if args.lr_final > 0:
        if args.steps:
            decay_steps = args.steps
        else:
            from torchain_tpu.data.cegs import iter_cegs_ark

            n_records = sum(
                1 for p in dataset.paths for _ in iter_cegs_ark(p)
            )
            decay_steps = max(1, args.epochs * n_records)
        decay_steps = max(1, decay_steps // max(1, args.grad_accum_steps))
    tcfg = TrainerConfig(
        lr=args.lr,
        lr_final=args.lr_final,
        lr_decay_steps=decay_steps,
        grad_accum_steps=args.grad_accum_steps,
        optimizer=args.optimizer,
        dropout_schedule=args.dropout_schedule,
        max_param_change=args.max_param_change,
        max_change_per_component=args.max_change_per_component,
        backstitch_scale=args.backstitch_scale,
        backstitch_interval=args.backstitch_interval,
        batch_size=bsz,
        num_epochs=args.epochs,
        semi_ortho_every=(
            args.semi_ortho_every
            if args.model in ("tdnnf", "cnn-tdnn")
            else 0
        ),
        checkpoint_dir=args.checkpoint_dir,
        mesh=MeshConfig(data=args.data_parallel, model=args.model_parallel),
        loss=ChainLossOptions(
            l2_regularize=args.l2_regularize,
            leaky_hmm_coefficient=args.leaky_hmm_coefficient,
            xent_regularize=args.xent_regularize,
        ),
        log_every=20,
    )
    trainer = Trainer(model, den, tcfg, setup["example"])
    if args.checkpoint_dir and trainer.restore_checkpoint():
        print(f"[cegs] resumed from step {int(trainer.state.step)}")
    results = trainer.fit(dataset, log_fn=print)
    print(
        f"[cegs] done: chain objf/frame={results.objf:.4f} "
        f"({time.time() - t0:.1f}s)"
    )
    out = dict(objf=results.objf, steps=int(trainer.state.step))
    print(_json.dumps(out))
    return out


def _build_model(args, num_pdfs: int, feat_dim: int):
    """Construct the --model family from CLI args; returns (model, cfg)."""
    from torchain_tpu.models import (
        CNNTDNN,
        TDNN,
        TDNNF,
        TDNNLSTM,
        CnnTdnnConfig,
        Conformer,
        ConformerConfig,
        TdnnConfig,
        TdnnfConfig,
        TdnnLstmConfig,
    )

    if args.model == "tdnn":
        cfg = TdnnConfig(num_pdfs=num_pdfs, hidden_dim=args.hidden_dim)
        return TDNN(cfg), cfg
    if args.model == "tdnnf":
        cfg = TdnnfConfig(
            num_pdfs=num_pdfs,
            hidden_dim=args.hidden_dim,
            bottleneck_dim=args.bottleneck_dim,
            num_layers=args.num_layers,
        )
        return TDNNF(cfg), cfg
    if args.model == "cnn-tdnn":
        cfg = CnnTdnnConfig(
            num_pdfs=num_pdfs,
            feat_dim=feat_dim,
            hidden_dim=args.hidden_dim,
            bottleneck_dim=args.bottleneck_dim,
            num_tdnnf_layers=args.num_layers,
        )
        return CNNTDNN(cfg), cfg
    if args.model == "tdnn-lstm":
        cfg = TdnnLstmConfig(
            num_pdfs=num_pdfs,
            hidden_dim=args.hidden_dim,
            cell_dim=args.hidden_dim,
            rec_proj_dim=max(8, args.hidden_dim // 4),
            nonrec_proj_dim=max(8, args.hidden_dim // 4),
        )
        return TDNNLSTM(cfg), cfg
    cfg = ConformerConfig(
        num_pdfs=num_pdfs, dim=args.hidden_dim, num_layers=args.num_layers
    )
    return Conformer(cfg), cfg


def main(argv=None) -> dict:
    args = build_argparser().parse_args(argv)
    if args.synthetic_words:
        args.synthetic = True
    if not args.synthetic and not args.wav_dir and not args.cegs:
        print(
            "Pass --synthetic for the built-in corpus, --wav-dir for a "
            "raw-audio Kaldi data dir, or --cegs + --den-fst for a "
            "completed Kaldi chain prep.",
            file=sys.stderr,
        )
        sys.exit(2)

    # A dead accelerator relay makes backend init hang UNINTERRUPTIBLY in
    # C; probe it in a killable subprocess first and fall back to CPU so
    # the recipe degrades loudly instead of freezing (same guard as
    # bench.py / __graft_entry__.dryrun_multichip)
    from torchain_tpu.utils.backend import backend_reachable

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # explicit CPU run: make it stick at the CONFIG level — the axon
        # sitecustomize overrides env-derived config, and with a dead relay
        # that hangs backend init even under JAX_PLATFORMS=cpu (round 4)
        import jax

        jax.config.update("jax_platforms", "cpu")
        tpu_dead = False
    else:
        tpu_dead = not backend_reachable()

    import jax

    if tpu_dead:
        print(
            "[warn] accelerator backend unreachable; falling back to CPU",
            file=sys.stderr,
        )
        jax.config.update("jax_platforms", "cpu")

    if args.distributed:
        # multi-host pod: one process per host; GSPMD spans hosts via DCN
        # (SURVEY.md section 2.3 rebuild plan)
        jax.distributed.initialize()
        print(
            f"[distributed] process {jax.process_index()}/{jax.process_count()} "
            f"local devices: {jax.local_device_count()}"
        )
    import jax.numpy as jnp  # noqa: F401 — backend initialized above

    if args.cegs:
        return _train_from_cegs(args)

    from torchain_tpu.data import ChainDataset, synthetic_dataset
    from torchain_tpu.eval import make_decoding_graph, viterbi_decode, wer
    from torchain_tpu.graphs import SupervisionOptions, estimate_phone_lm, PhoneLmOptions
    from torchain_tpu.models import (
        TDNN,
        TDNNF,
        TDNNLSTM,
        Conformer,
        ConformerConfig,
        TdnnConfig,
        TdnnfConfig,
        TdnnLstmConfig,
    )
    from torchain_tpu.ops import ChainLossOptions, auto_den_graph
    from torchain_tpu.parallel import MeshConfig
    from torchain_tpu.train import Trainer, TrainerConfig
    from torchain_tpu.train.step import make_forward_fn

    t0 = time.time()
    word_corpus = None
    if args.wav_dir:
        from torchain_tpu.data import load_wav_dir

        print(
            f"[stage 0] assembling corpus from raw-audio dir {args.wav_dir} "
            f"(cmvn={args.cmvn}, speed_perturb={args.speed_perturb})"
        )
        word_corpus = load_wav_dir(
            args.wav_dir,
            cmvn=None if args.cmvn == "none" else args.cmvn,
            speed_perturb=args.speed_perturb,
            context_width=args.context_width,
        )
        corpus = word_corpus.corpus
        args.feat_dim = corpus.feat_dim
        if word_corpus.lexicon is None or not any(word_corpus.transcripts):
            word_corpus = None  # no word decode without lexicon+text
    elif args.synthetic_words:
        from torchain_tpu.data import synthetic_word_dataset

        print(
            f"[stage 0] preparing synthetic WORD corpus "
            f"({args.num_utts} utts, vocab {args.vocab_size})"
        )
        word_corpus = synthetic_word_dataset(
            num_utts=args.num_utts,
            vocab_size=args.vocab_size,
            num_phones=args.num_phones,
            feat_dim=args.feat_dim,
            context_width=args.context_width,
            seed=args.seed,
        )
        corpus = word_corpus.corpus
    else:
        print(f"[stage 0] preparing synthetic corpus ({args.num_utts} utts)")
        corpus = synthetic_dataset(
            num_utts=args.num_utts,
            num_phones=args.num_phones,
            feat_dim=args.feat_dim,
            context_width=args.context_width,
            seed=args.seed,
        )
    if args.distributed and jax.process_count() > 1 and args.e2e:
        # e2e path: per-host utterance shard (the standard path instead
        # shards rows of a (seed, epoch)-deterministic global batch plan
        # inside Trainer.fit / ChainDataset.batches)
        corpus.utts = corpus.utts[jax.process_index() :: jax.process_count()]
    valid_utts = []
    if args.valid_utts > 0:
        valid_utts = corpus.utts[-args.valid_utts :]
        corpus.utts = corpus.utts[: -args.valid_utts]
        if word_corpus is not None:
            word_corpus.transcripts = word_corpus.transcripts[: -args.valid_utts]

    if args.ivector_dim > 0:
        # Kaldi online-ivector stages: UBM + extractor trained on the
        # TRAINING utterances, the same extractor applied to held-out data
        from torchain_tpu.data import append_corpus_ivectors, extract_ivectors_online

        print(
            f"[stage 0i] training iVector extractor "
            f"(dim {args.ivector_dim}, {args.ivector_gauss} Gaussians)"
        )
        corpus.utts, ivec_ext = append_corpus_ivectors(
            corpus.utts,
            ivector_dim=args.ivector_dim,
            num_gauss=args.ivector_gauss,
            seed=args.seed,
        )
        for i, u in enumerate(valid_utts):
            ivecs = extract_ivectors_online(ivec_ext, u.feats)
            per_frame = np.repeat(ivecs, 10, axis=0)[: u.feats.shape[0]]
            valid_utts[i] = dataclasses.replace(
                u,
                feats=np.concatenate(
                    [u.feats, per_frame.astype(u.feats.dtype)], axis=1
                ),
            )
        args.feat_dim += args.ivector_dim

    if args.tied_tree_pdfs > 0:
        from torchain_tpu.graphs import (
            accumulate_tree_stats,
            build_tied_tree,
            compile_den_graph,
            make_den_fst,
            make_normalization_fst,
        )

        print(
            f"[stage 0t] building tied {args.tied_tree_context} tree "
            f"({args.tied_tree_pdfs} pdfs) from alignments"
        )
        stats = accumulate_tree_stats(
            corpus.utts,
            args.num_phones,
            frame_subsampling_factor=3,
            context=args.tied_tree_context,
        )
        tied = build_tied_tree(stats, num_pdfs=args.tied_tree_pdfs)
        den_fst = make_den_fst(corpus.phone_lm, tied)
        graph = compile_den_graph(den_fst, tied.num_pdfs)
        corpus.tree = tied
        corpus.den_graph = graph
        corpus.den_fst = den_fst
        corpus.dense_den = None
        corpus.norm_fst = make_normalization_fst(den_fst, graph.initial_probs)
        print(
            f"[stage 0t] tied tree: {tied.num_pdfs} pdfs, den graph "
            f"S={graph.num_states} A={graph.num_arcs}"
        )

    model, cfg = _build_model(args, corpus.tree.num_pdfs, args.feat_dim)
    left, right = cfg.context
    fsf = cfg.frame_subsampling_factor

    print(
        f"[stage 1] dataset: chunk={args.chunk_frames} ctx=({left},{right})"
        + (" e2e/flat-start" if args.e2e else "")
    )
    if args.e2e:
        from torchain_tpu.data import E2eChainDataset

        dataset = E2eChainDataset(
            corpus.utts,
            corpus.tree,
            corpus.norm_fst,
            chunk_frames_out=args.chunk_frames,
            left_context=left,
            right_context=right,
            frame_subsampling_factor=fsf,
            seed=args.seed,
        )
        dataset.chunks = []  # interface parity for the log line below
    else:
        dataset = ChainDataset(
            corpus.utts,
            corpus.tree,
            corpus.norm_fst,
            chunk_frames_out=args.chunk_frames,
            left_context=left,
            right_context=right,
            sup_opts=SupervisionOptions(
                left_tolerance=args.left_tolerance,
                right_tolerance=args.right_tolerance,
                frame_subsampling_factor=fsf,
            ),
            seed=args.seed,
        )

    if args.precompile_egs and hasattr(dataset, "precompile"):
        t_pre = time.time()
        n_pre = dataset.precompile(num_workers=args.precompile_egs)
        print(f"[stage 1] precompiled {n_pre} egs in {time.time()-t_pre:.1f}s")
    if args.load_egs and hasattr(dataset, "load_egs"):
        n_egs = dataset.load_egs(args.load_egs)
        print(f"[stage 1] loaded {n_egs} egs from {args.load_egs}")
    if args.save_egs and hasattr(dataset, "save_egs"):
        t_egs = time.time()
        n_egs = dataset.save_egs(args.save_egs)
        print(
            f"[stage 1] wrote {n_egs} egs to {args.save_egs} "
            f"in {time.time()-t_egs:.1f}s"
        )

    den = auto_den_graph(
        corpus.den_graph,
        phone_lm=corpus.phone_lm,
        tree=corpus.tree,
        batch_hint=args.batch_size,
        data_shards=args.data_parallel,
    )
    print(f"[stage 1] den path: {type(den).__name__}")
    # Kaldi-style exponential decay reaches --lr-final exactly at the last
    # step of the scheduled run (epochs * batches-per-epoch)
    n_records = len(dataset.chunks) or len(corpus.utts)  # e2e: ~1 chunk/utt
    steps_per_epoch = max(1, n_records // args.batch_size)
    decay_steps = args.steps if args.steps else args.epochs * steps_per_epoch
    # optax.MultiSteps advances the inner schedule once per ACCUMULATION
    # CYCLE, not per micro-batch — scale the horizon so lr_final is still
    # reached at the end of training
    decay_steps = max(1, decay_steps // max(1, args.grad_accum_steps))
    tcfg = TrainerConfig(
        lr=args.lr,
        lr_final=args.lr_final,
        lr_decay_steps=decay_steps if args.lr_final > 0 else 0,
        grad_accum_steps=args.grad_accum_steps,
        optimizer=args.optimizer,
        dropout_schedule=args.dropout_schedule,
        frame_shift_cycle=args.frame_shift_cycle,
        max_param_change=args.max_param_change,
        max_change_per_component=args.max_change_per_component,
        backstitch_scale=args.backstitch_scale,
        backstitch_interval=args.backstitch_interval,
        batch_size=args.batch_size,
        num_epochs=args.epochs,
        semi_ortho_every=(
            args.semi_ortho_every
            if args.model in ("tdnnf", "cnn-tdnn")
            else 0
        ),
        checkpoint_dir=args.checkpoint_dir,
        mesh=MeshConfig(data=args.data_parallel, model=args.model_parallel),
        loss=ChainLossOptions(
            l2_regularize=args.l2_regularize,
            leaky_hmm_coefficient=args.leaky_hmm_coefficient,
            xent_regularize=args.xent_regularize,
        ),
        log_every=20,
    )
    t_in = args.chunk_frames * fsf + left + right
    example = np.zeros((2, t_in, args.feat_dim), np.float32)
    trainer = Trainer(model, den, tcfg, example, tree=corpus.tree)
    if args.checkpoint_dir and trainer.restore_checkpoint():
        print(f"[stage 2] resumed from step {int(trainer.state.step)}")

    print(f"[stage 2] training {args.model} on {len(dataset.chunks)} chunks")
    if args.flat_start_ladder:
        # stage 1: flat-start on transcripts
        from torchain_tpu.data import E2eChainDataset, Utterance
        from torchain_tpu.eval.align import align_corpus
        from torchain_tpu.train.step import make_forward_fn

        print("[ladder 1] flat-start e2e training")
        e2e_ds = E2eChainDataset(
            corpus.utts, corpus.tree, corpus.norm_fst,
            chunk_frames_out=args.chunk_frames,
            left_context=left, right_context=right,
            frame_subsampling_factor=fsf, seed=args.seed,
        )
        trainer.fit(e2e_ds, log_fn=print)
        print("[ladder 2] forced alignment with the stage-1 model")
        fwd = make_forward_fn(model)
        variables = {"params": trainer.state.params}
        if trainer.state.batch_stats:
            variables["batch_stats"] = trainer.state.batch_stats
        gen = align_corpus(
            fwd, variables, corpus.utts, corpus.tree,
            frame_subsampling_factor=fsf,
            left_context=left, right_context=right,
        )
        corpus.utts = [
            Utterance(feats=u.feats, alignment=a, utt_id=u.utt_id)
            for u, a in zip(corpus.utts, gen)
        ]
        dataset = ChainDataset(
            corpus.utts, corpus.tree, corpus.norm_fst,
            chunk_frames_out=args.chunk_frames,
            left_context=left, right_context=right,
            sup_opts=SupervisionOptions(
                left_tolerance=args.left_tolerance,
                right_tolerance=args.right_tolerance,
                frame_subsampling_factor=fsf,
            ),
            seed=args.seed,
        )
        print("[ladder 3] tolerance-lattice training on generated alignments")

    if args.materialize_egs:
        if args.frame_shift_cycle:
            raise SystemExit(
                "--materialize-egs pins the frame shift; drop "
                "--frame-shift-cycle or materialization"
            )
        from torchain_tpu.data import MaterializedBatches

        dataset = MaterializedBatches(
            dataset, args.batch_size,
            device=args.materialize_egs == "device",
        )
        print(
            f"[stage 2] materialized {len(dataset)} minibatches "
            f"({dataset.nbytes / 1e6:.0f} MB)"
        )
    if args.steps:
        # step-bounded run: iterate manually (same per-step semantics as
        # Trainer.fit, incl. the periodic semi-orthogonal constraint)
        from torchain_tpu.models import constrain_semi_orthogonal

        done = False
        with trainer.mesh:
            while not done:
                got_any = False
                for batch in dataset.batches(args.batch_size):
                    got_any = True
                    feats, sup = trainer._put_batch(batch)
                    trainer.state, metrics = trainer.train_step(
                        trainer.state, feats, trainer.den, sup
                    )
                    step = int(trainer.state.step)
                    so_every = trainer.cfg.semi_ortho_every
                    if so_every and step % so_every == 0:
                        trainer.state = trainer.state.replace(
                            params=constrain_semi_orthogonal(trainer.state.params)
                        )
                    trainer.results.add({k: float(v) for k, v in metrics.items()})
                    if step >= args.steps:
                        done = True
                        break
                if not done and not got_any:
                    # batching groups chunks by length and drops partial
                    # minibatches; a batch size no bucket can fill would
                    # otherwise spin through empty epochs forever
                    raise SystemExit(
                        f"no full minibatch produced: --batch-size "
                        f"{args.batch_size} exceeds every same-length "
                        f"chunk bucket of this dataset — reduce "
                        f"--batch-size (or add data)"
                    )
        results = trainer.results
    else:
        results = trainer.fit(dataset)
    print(f"[stage 2] done: {results} ({time.time() - t0:.1f}s)")
    if args.metrics_out:
        trainer.dump_metrics(args.metrics_out)
    if args.checkpoint_dir:
        trainer.save_checkpoint()
    if args.combine_last and args.checkpoint_dir:
        n = trainer.combine(args.combine_last)
        print(f"[stage 2c] combine: averaged last {n} checkpoints "
              "(subsequent valid/decode stages use the combined model)")

    out = dict(objf=results.objf, steps=int(trainer.state.step))
    if valid_utts and not args.e2e:
        valid_ds = ChainDataset(
            valid_utts,
            corpus.tree,
            corpus.norm_fst,
            chunk_frames_out=args.chunk_frames,
            left_context=left,
            right_context=right,
            sup_opts=SupervisionOptions(
                left_tolerance=args.left_tolerance,
                right_tolerance=args.right_tolerance,
                frame_subsampling_factor=fsf,
            ),
        )
        vres = trainer.evaluate(valid_ds)
        print(f"[stage 2v] valid: {vres}")
        out["valid_objf"] = vres.objf
    if args.decode:
        print("[stage 3] decoding with the training LM")
        refs = []
        for u in corpus.utts:
            seq = []
            for p, _ in u.alignment:
                seq.append(p)
            refs.append(seq)
        lm = estimate_phone_lm(refs, PhoneLmOptions(ngram_order=2, num_extra_lm_states=500))
        dgraph = make_decoding_graph(lm, corpus.tree)
        forward = make_forward_fn(model)
        variables = {"params": trainer.state.params}
        if trainer.state.batch_stats:
            variables["batch_stats"] = trainer.state.batch_stats
        hyps = []
        for u in corpus.utts:
            T_in_utt = u.feats.shape[0]
            t_out = T_in_utt // fsf
            idx = np.clip(
                np.arange(-left, t_out * fsf + right), 0, T_in_utt - 1
            )
            feats = jnp.asarray(u.feats[idx][None])
            y = np.asarray(forward(variables, feats))[0]
            hyp, _ = viterbi_decode(
                dgraph, y, beam=args.decode_beam,
                phone_bonus=args.phone_insertion_bonus,
            )
            hyps.append(hyp)
        score = wer(refs, hyps)
        print(f"[stage 4] PER {score['wer']:.2f}% ({score})")
        out["per"] = score["wer"]
    if args.decode and word_corpus is not None:
        # word-level decode over HCLG (latgen-faster-mapped role)
        from torchain_tpu.data import train_word_lm
        from torchain_tpu.eval import make_word_decoding_graph

        print("[stage 5] word decode: building HCLG from training transcripts")
        word_lm = train_word_lm(
            word_corpus.transcripts, order=args.word_lm_order
        )
        wgraph = make_word_decoding_graph(
            word_lm, word_corpus.lexicon, corpus.tree
        )
        print(
            f"[stage 5] HCLG: {wgraph.num_states} states, "
            f"{wgraph.src.shape[0]} arcs"
        )
        forward = make_forward_fn(model)
        variables = {"params": trainer.state.params}
        if trainer.state.batch_stats:
            variables["batch_stats"] = trainer.state.batch_stats
        sweep = args.lmwt_max >= args.lmwt_min > 0
        whyps = []
        wlats = []
        for u in corpus.utts:
            T_in_utt = u.feats.shape[0]
            t_out = T_in_utt // fsf
            idx = np.clip(np.arange(-left, t_out * fsf + right), 0, T_in_utt - 1)
            feats = jnp.asarray(u.feats[idx][None])
            y = np.asarray(forward(variables, feats))[0]
            if sweep:
                from torchain_tpu.eval import lattice_decode

                wlats.append(lattice_decode(wgraph, y, beam=args.decode_beam))
            else:
                hyp, _ = viterbi_decode(wgraph, y, beam=args.decode_beam)
                whyps.append(hyp)
        if sweep:
            # score.sh role: one corpus-level LMWT picked by best WER
            from torchain_tpu.eval import score_sweep

            best_lmwt, wscore, whyps, by_lmwt = score_sweep(
                wlats,
                word_corpus.transcripts,
                lmwt_range=range(args.lmwt_min, args.lmwt_max + 1),
            )
            print(f"[stage 5] lmwt sweep: {by_lmwt} -> best {best_lmwt}")
            out["best_lmwt"] = best_lmwt
            if args.mbr:
                # lattice-mbr-decode role: minimum-Bayes-risk word sequence
                # from the sausage, at the swept LMWT
                from torchain_tpu.eval import mbr_decode, rescore_lattice

                mhyps = [
                    mbr_decode(
                        rescore_lattice(l, lm_scale=float(best_lmwt))
                    ).words
                    for l in wlats
                ]
                mscore = wer(word_corpus.transcripts, mhyps)
                print(f"[stage 5m] MBR WER {mscore['wer']:.2f}% ({mscore})")
                out["mbr_wer"] = mscore["wer"]
        else:
            wscore = wer(word_corpus.transcripts, whyps)
        print(f"[stage 5] WER {wscore['wer']:.2f}% ({wscore})")
        out["wer"] = wscore["wer"]
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
