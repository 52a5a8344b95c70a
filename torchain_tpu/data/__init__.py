"""data — feature extraction and chunk loading.

Replaces the Kaldi feature pipeline (compute-mfcc-feats / compute-fbank-feats
+ apply-cmvn) and the egs archive machinery (nnet3-chain-get-egs /
shuffle / merge — SURVEY.md section 2.2 "Chain egs format & binaries") with
pure-JAX DSP and a host-side chunk loader emitting packed batches.
"""

from torchain_tpu.data.features import (FbankOptions, apply_cmvn_stats, cmvn, compute_cmvn_stats, fbank, mfcc)
from torchain_tpu.data.ivector import (
    DiagUbm,
    IvectorExtractor,
    append_corpus_ivectors,
    extract_ivector,
    extract_ivectors_online,
    train_diag_ubm,
    train_ivector_extractor,
)
from torchain_tpu.data.cegs import (
    CegsDataset,
    KaldiSupervision,
    NnetChainExample,
    NnetChainSupervision,
    NnetIo,
    batches_from_cegs,
    example_to_batch,
    iter_cegs_ark,
    make_chain_example,
    read_cegs_ark,
    write_cegs_ark,
)
from torchain_tpu.data.augment import (
    perturb_alignment,
    resample_waveform,
    speed_perturb_wavs,
)
from torchain_tpu.data.kaldi_compat import (
    apply_cmvn_by_speaker,
    apply_cmvn_stats_matrix,
    cmvn_stats_from_feats,
    compute_cmvn_stats_per_spk,
    compute_feats_from_wav_scp,
    extract_utterance_waves,
    load_kaldi_dir,
    load_wav_dir,
    read_segments,
    read_utt2spk,
    read_wav,
    read_wav_scp,
    spk2utt_from_utt2spk,
    write_utt2spk,
    write_wav,
)
from torchain_tpu.data.synth_wav import make_wav_data_dir
from torchain_tpu.data.materialize import MaterializedBatches
from torchain_tpu.data.prefetch import Prefetcher
from torchain_tpu.data.words import (
    WordCorpus,
    random_lexicon,
    synthetic_word_dataset,
    train_word_lm,
)
from torchain_tpu.data.loader import (
    ChainBatch,
    ChainDataset,
    E2eChainDataset,
    Utterance,
    synthetic_dataset,
)

__all__ = [
    "FbankOptions",
    "fbank",
    "mfcc",
    "cmvn",
    "compute_cmvn_stats",
    "apply_cmvn_stats",
    "ChainBatch",
    "MaterializedBatches",
    "Prefetcher",
    "ChainDataset",
    "E2eChainDataset",
    "Utterance",
    "synthetic_dataset",
    "WordCorpus",
    "random_lexicon",
    "synthetic_word_dataset",
    "train_word_lm",
    "DiagUbm",
    "IvectorExtractor",
    "append_corpus_ivectors",
    "extract_ivector",
    "extract_ivectors_online",
    "train_diag_ubm",
    "train_ivector_extractor",
    "KaldiSupervision",
    "NnetChainExample",
    "NnetChainSupervision",
    "NnetIo",
    "CegsDataset",
    "batches_from_cegs",
    "example_to_batch",
    "iter_cegs_ark",
    "make_chain_example",
    "read_cegs_ark",
    "write_cegs_ark",
    "load_kaldi_dir",
    "read_wav",
    "write_wav",
    "read_wav_scp",
    "compute_feats_from_wav_scp",
    "read_utt2spk",
    "write_utt2spk",
    "spk2utt_from_utt2spk",
    "read_segments",
    "cmvn_stats_from_feats",
    "compute_cmvn_stats_per_spk",
    "apply_cmvn_stats_matrix",
    "apply_cmvn_by_speaker",
    "extract_utterance_waves",
    "load_wav_dir",
    "make_wav_data_dir",
    "resample_waveform",
    "perturb_alignment",
    "speed_perturb_wavs",
]
