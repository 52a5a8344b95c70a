"""graphs CLI: make-den-fst (chain-make-den-fst role), info, convert."""

import json
import pathlib

import numpy as np
import pytest

from torchain_tpu.cli.graphs import main as graphs_main


@pytest.fixture()
def ali_dir(tmp_path):
    rng = np.random.default_rng(0)
    lines = []
    for u in range(8):
        ali = " ".join(
            f"{int(rng.integers(1, 6))}:{int(rng.integers(3, 9))}"
            for _ in range(4)
        )
        lines.append(f"utt{u} {ali}")
    (tmp_path / "ali.txt").write_text("\n".join(lines) + "\n")
    return tmp_path


def test_make_den_fst_round_trips(ali_dir, tmp_path):
    out = tmp_path / "graph"
    rc = graphs_main(
        ["make-den-fst", str(ali_dir), str(out), "--lm-order", "2",
         "--lm-extra-states", "50"]
    )
    assert rc == 0
    for f in ("den.fst", "normalization.fst", "tree.json"):
        assert (out / f).exists()
    # the binary den.fst loads back into the den-graph compiler and the
    # normalization fst is epsilon-free and composable
    from torchain_tpu.fstkit.openfst_io import read_openfst
    from torchain_tpu.graphs.den_graph import compile_den_graph

    meta = json.loads((out / "tree.json").read_text())
    fst, _ = read_openfst(str(out / "den.fst"))
    g = compile_den_graph(fst, meta["num_pdfs"])
    assert g.num_pdfs == meta["num_pdfs"] and g.num_states > 1
    norm, _ = read_openfst(str(out / "normalization.fst"))
    assert norm.num_states > 0 and not norm.has_epsilons()


def test_info_and_convert(ali_dir, tmp_path, capsys):
    out = tmp_path / "graph"
    graphs_main(["make-den-fst", str(ali_dir), str(out), "--lm-order", "2"])
    assert graphs_main(["info", str(out / "den.fst")]) == 0
    shown = capsys.readouterr().out
    assert "fst type    vector" in shown
    cst = tmp_path / "den_const.fst"
    assert graphs_main(
        ["convert", str(out / "den.fst"), str(cst), "--fsttype", "const",
         "--aligned"]
    ) == 0
    assert graphs_main(["info", str(cst)]) == 0
    shown = capsys.readouterr().out
    assert "fst type    const" in shown
    # text round trip preserves arc counts
    txt = tmp_path / "den.txt"
    assert graphs_main(["convert", str(out / "den.fst"), str(txt), "--text"]) == 0
    assert graphs_main(["info", str(txt)]) == 0
