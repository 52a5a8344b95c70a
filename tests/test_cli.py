"""CLI recipe smoke tests (tiny settings, CPU)."""

import json

import pytest

from torchain_tpu.cli.train import build_argparser, main


def run_cli(args):
    return main(args)


@pytest.mark.slow
def test_cli_train_decode_valid():
    out = run_cli(
        [
            "--synthetic", "--num-utts", "14", "--num-phones", "4",
            "--feat-dim", "10", "--hidden-dim", "48", "--bottleneck-dim", "12",
            "--num-layers", "2", "--epochs", "2", "--chunk-frames", "12",
            "--batch-size", "4", "--decode", "--valid-utts", "2",
        ]
    )
    assert out["steps"] > 0
    assert "per" in out and out["per"] <= 100.0
    assert "valid_objf" in out and out["valid_objf"] < 0.5


@pytest.mark.slow
def test_cli_e2e_mode():
    out = run_cli(
        [
            "--synthetic", "--e2e", "--num-utts", "10", "--num-phones", "4",
            "--feat-dim", "10", "--hidden-dim", "48", "--bottleneck-dim", "12",
            "--num-layers", "2", "--epochs", "1", "--chunk-frames", "12",
            "--batch-size", "4",
        ]
    )
    assert out["steps"] > 0


def test_argparser_help():
    p = build_argparser()
    assert any("--leaky-hmm-coefficient" in str(a.option_strings) for a in p._actions)


@pytest.mark.slow
def test_cli_ivector_ngsgd():
    """Online-ivector stage + natural-gradient SGD + dropout schedule +
    frame-shift cycling through the recipe: iVector dims reach the model
    input, training and decode still work."""
    out = run_cli(
        [
            "--synthetic", "--num-utts", "14", "--num-phones", "4",
            "--feat-dim", "10", "--hidden-dim", "48", "--bottleneck-dim", "12",
            "--num-layers", "2", "--epochs", "2", "--chunk-frames", "12",
            "--batch-size", "4", "--decode", "--valid-utts", "2",
            "--ivector-dim", "3", "--ivector-gauss", "8",
            "--optimizer", "ngsgd", "--lr", "0.01",
            "--dropout-schedule", "0,0.3@0.5,0", "--frame-shift-cycle",
        ]
    )
    assert out["steps"] > 0
    assert "per" in out and out["per"] <= 100.0


@pytest.mark.slow
def test_cli_egs_archive_roundtrip(tmp_path):
    """--save-egs writes the archive; a second run --load-egs trains from
    it (prep-once workflow of nnet3-chain-get-egs archives)."""
    egs = str(tmp_path / "egs.npz")
    common = [
        "--synthetic", "--num-utts", "10", "--num-phones", "4",
        "--feat-dim", "8", "--hidden-dim", "32", "--bottleneck-dim", "8",
        "--num-layers", "2", "--epochs", "1", "--chunk-frames", "10",
        "--batch-size", "4",
    ]
    out1 = run_cli(common + ["--save-egs", egs])
    import os

    assert os.path.exists(egs)
    out2 = run_cli(common + ["--load-egs", egs])
    assert out2["steps"] == out1["steps"] > 0


@pytest.mark.slow
def test_cli_word_decode_lmwt_sweep():
    out = run_cli(
        [
            "--synthetic", "--synthetic-words", "--num-utts", "8",
            "--num-phones", "5", "--feat-dim", "10", "--hidden-dim", "48",
            "--bottleneck-dim", "12", "--num-layers", "2", "--epochs", "2",
            "--chunk-frames", "12", "--batch-size", "4", "--decode",
            "--lmwt-min", "1", "--lmwt-max", "3",
        ]
    )
    assert "wer" in out
    assert 1 <= out["best_lmwt"] <= 3


def test_cli_steps_oversized_batch_errors():
    """A --steps run whose batch size no length bucket can fill must fail
    loudly instead of spinning through empty epochs forever (r5 fix: the
    while-not-done loop re-entered dataset.batches indefinitely)."""
    with pytest.raises(SystemExit, match="no full minibatch"):
        run_cli(
            [
                "--synthetic", "--num-utts", "8", "--num-phones", "5",
                "--hidden-dim", "32", "--num-layers", "2", "--epochs", "1",
                "--no-ivector", "--steps", "2",
            ]
        )
