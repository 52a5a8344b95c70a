"""nnet3 AM import (graphs/nnet3.py): binary round-trip against the
self-written golden layout, numpy forward vs an independently-coded
reference, descriptor parsing, unknown-component tolerance."""

import io

import numpy as np
import pytest

from torchain_tpu.graphs.nnet3 import (
    AmNnet,
    Component,
    Desc,
    Nnet,
    Node,
    read_am_nnet,
    write_am_nnet,
)
from torchain_tpu.graphs.transition_model import chain_transition_model


def _tdnnf_style_nnet(rng, feat_dim=8, ivec_dim=4, hid=16, bn=6, pdfs=10):
    """A miniature chain TDNN-F: LDA-style fixed affine over spliced
    input + ivector, affine+relu+batchnorm, a factored TdnnComponent pair
    with internal time offsets, affine output head."""
    splice_dim = 3 * feat_dim + ivec_dim
    comps = {}

    def mat(r, c):
        return rng.standard_normal((r, c)).astype(np.float32) * 0.3

    comps["lda"] = Component(
        "lda", "FixedAffineComponent",
        {"LinearParams": mat(splice_dim, splice_dim),
         "BiasParams": mat(1, splice_dim)[0]},
    )
    comps["tdnn1.affine"] = Component(
        "tdnn1.affine", "NaturalGradientAffineComponent",
        {"LearningRate": 0.001, "MaxChange": 0.75,
         "LinearParams": mat(hid, splice_dim), "BiasParams": mat(1, hid)[0],
         "RankIn": 20, "RankOut": 80, "UpdatePeriod": 4,
         "NumSamplesHistory": 2000.0, "Alpha": 4.0},
    )
    comps["tdnn1.relu"] = Component(
        "tdnn1.relu", "RectifiedLinearComponent", {"Dim": hid}
    )
    mean = rng.standard_normal(hid).astype(np.float32) * 0.1
    var = (rng.random(hid).astype(np.float32) + 0.5)
    comps["tdnn1.batchnorm"] = Component(
        "tdnn1.batchnorm", "BatchNormComponent",
        {"Dim": hid, "BlockDim": hid, "Epsilon": 1e-3, "TargetRms": 1.0,
         "TestMode": False, "Count": 1000.0,
         "StatsMean": mean, "StatsVar": var},
    )
    # factored pair: linear (semi-orthogonal) with offsets, then affine
    comps["tdnnf2.linear"] = Component(
        "tdnnf2.linear", "TdnnComponent",
        {"TimeOffsets": [-3, 0], "LearningRate": 0.001,
         "LinearParams": mat(bn, 2 * hid),
         "BiasParams": np.zeros(0, np.float32),
         "OrthonormalConstraint": -1.0},
    )
    comps["tdnnf2.affine"] = Component(
        "tdnnf2.affine", "TdnnComponent",
        {"TimeOffsets": [0, 3], "LearningRate": 0.001,
         "LinearParams": mat(hid, 2 * bn),
         "BiasParams": mat(1, hid)[0]},
    )
    comps["output.affine"] = Component(
        "output.affine", "NaturalGradientAffineComponent",
        {"LearningRate": 0.0005,
         "LinearParams": mat(pdfs, hid), "BiasParams": mat(1, pdfs)[0]},
    )

    nodes = {}
    nodes["input"] = Node("input", "input", dim=feat_dim)
    nodes["ivector"] = Node("input", "ivector", dim=ivec_dim)
    nodes["lda"] = Node(
        "component", "lda", component="lda",
        input=Desc.parse(
            "Append(Offset(input,-1),input,Offset(input,1),"
            "ReplaceIndex(ivector,t,0))"
        ),
    )
    nodes["tdnn1.affine"] = Node(
        "component", "tdnn1.affine", component="tdnn1.affine",
        input=Desc.parse("lda"),
    )
    nodes["tdnn1.relu"] = Node(
        "component", "tdnn1.relu", component="tdnn1.relu",
        input=Desc.parse("tdnn1.affine"),
    )
    nodes["tdnn1.batchnorm"] = Node(
        "component", "tdnn1.batchnorm", component="tdnn1.batchnorm",
        input=Desc.parse("tdnn1.relu"),
    )
    nodes["tdnnf2.linear"] = Node(
        "component", "tdnnf2.linear", component="tdnnf2.linear",
        input=Desc.parse("tdnn1.batchnorm"),
    )
    nodes["tdnnf2.affine"] = Node(
        "component", "tdnnf2.affine", component="tdnnf2.affine",
        input=Desc.parse("tdnnf2.linear"),
    )
    nodes["output.affine"] = Node(
        "component", "output.affine", component="output.affine",
        input=Desc.parse("Sum(tdnnf2.affine,Scale(0.66,tdnn1.batchnorm))"),
    )
    nodes["output"] = Node(
        "output", "output", input=Desc.parse("output.affine"),
        objective="linear",
    )
    return Nnet(nodes=nodes, components=comps)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    rng = np.random.default_rng(11)
    nnet = _tdnnf_style_nnet(rng)
    tm = chain_transition_model(5)
    am = AmNnet(nnet=nnet, left_context=4, right_context=4,
                priors=np.zeros(0, np.float32))
    path = str(tmp_path_factory.mktemp("mdl") / "final.mdl")
    write_am_nnet(path, tm, am)
    return path, tm, am


class TestRoundTrip:
    def test_read_back(self, model):
        path, tm, am = model
        tm2, am2 = read_am_nnet(path)
        assert tm2.tuples == tm.tuples
        assert am2.left_context == 4 and am2.right_context == 4
        assert set(am2.nnet.nodes) == set(am.nnet.nodes)
        assert set(am2.nnet.components) == set(am.nnet.components)
        for name, c in am.nnet.components.items():
            c2 = am2.nnet.components[name]
            assert c2.type == c.type
            for k, v in c.attrs.items():
                if isinstance(v, np.ndarray):
                    np.testing.assert_allclose(c2.attrs[k], v, rtol=1e-6)
                elif isinstance(v, float):
                    assert c2.attrs[k] == pytest.approx(v, rel=1e-6)
                else:
                    assert c2.attrs[k] == v

    def test_config_lines_roundtrip(self, model):
        path, _tm, am = model
        _tm2, am2 = read_am_nnet(path)
        assert [n.input.to_string() for n in am.nnet.nodes.values()
                if n.input is not None] == [
            n.input.to_string() for n in am2.nnet.nodes.values()
            if n.input is not None
        ]

    def test_transition_model_only_reader_still_works(self, model):
        from torchain_tpu.graphs.transition_model import (
            read_transition_model,
        )

        path, tm, _am = model
        tm2 = read_transition_model(path)
        assert tm2.tuples == tm.tuples


class TestForward:
    def test_matches_independent_numpy(self, model):
        """Forward through the read-back model vs a from-scratch numpy
        computation coded here with explicit indexing."""
        path, _tm, _am = model
        _tm2, am = read_am_nnet(path)
        nnet = am.nnet
        rng = np.random.default_rng(3)
        T, F, IV = 30, 8, 4
        feats = rng.standard_normal((T, F)).astype(np.float32)
        ivec = rng.standard_normal((T, IV)).astype(np.float32)
        t = np.arange(6, 24, 3)

        got = nnet.forward({"input": feats, "ivector": ivec}, t)

        C = nnet.components
        def lda_at(tt):
            x = np.concatenate(
                [feats[tt - 1], feats[tt], feats[tt + 1], ivec[0]]
            )
            c = C["lda"]
            return c.attrs["LinearParams"] @ x + c.attrs["BiasParams"]

        def bn1_at(tt):
            c = C["tdnn1.affine"]
            h = c.attrs["LinearParams"] @ lda_at(tt) + c.attrs["BiasParams"]
            h = np.maximum(h, 0)
            b = C["tdnn1.batchnorm"].attrs
            scale = b["TargetRms"] / np.sqrt(b["StatsVar"] + b["Epsilon"])
            return (h - b["StatsMean"]) * scale

        def f2lin_at(tt):
            c = C["tdnnf2.linear"]
            x = np.concatenate([bn1_at(tt - 3), bn1_at(tt)])
            return c.attrs["LinearParams"] @ x

        def f2aff_at(tt):
            c = C["tdnnf2.affine"]
            x = np.concatenate([f2lin_at(tt), f2lin_at(tt + 3)])
            return c.attrs["LinearParams"] @ x + c.attrs["BiasParams"]

        def out_at(tt):
            c = C["output.affine"]
            x = f2aff_at(tt) + 0.66 * bn1_at(tt)
            return c.attrs["LinearParams"] @ x + c.attrs["BiasParams"]

        want = np.stack([out_at(int(tt)) for tt in t])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_edge_clamp(self, model):
        path, _tm, _am = model
        _tm2, am = read_am_nnet(path)
        rng = np.random.default_rng(4)
        feats = rng.standard_normal((10, 8)).astype(np.float32)
        ivec = rng.standard_normal((10, 4)).astype(np.float32)
        out = am.nnet.forward({"input": feats, "ivector": ivec},
                              np.array([0]))
        assert np.all(np.isfinite(out))


class TestTolerance:
    def test_unknown_component_parses_but_wont_forward(self):
        rng = np.random.default_rng(0)
        c = Component(
            "mystery", "FruitSaladComponent",
            {"Dim": 8, "SelfRepairScale": 1e-5, "IsGradient": False,
             "ValueAvg": rng.random(8).astype(np.float32),
             "Params": rng.random((8, 8)).astype(np.float32)},
        )
        nnet = Nnet(
            nodes={
                "input": Node("input", "input", dim=8),
                "m": Node("component", "m", component="mystery",
                          input=Desc.parse("input")),
                "output": Node("output", "output", input=Desc.parse("m")),
            },
            components={"mystery": c},
        )
        buf = io.BytesIO()
        nnet.write_binary(buf)
        buf.seek(0)
        nnet2 = Nnet.read_binary(buf)
        assert nnet2.components["mystery"].type == "FruitSaladComponent"
        assert nnet2.components["mystery"].attrs["Dim"] == 8
        with pytest.raises(NotImplementedError, match="FruitSalad"):
            nnet2.forward({"input": np.zeros((4, 8), np.float32)},
                          np.array([1]))

    def test_describe(self, model):
        path, _tm, _am = model
        _tm2, am = read_am_nnet(path)
        d = am.nnet.describe()
        assert "num-parameters" in d and "TdnnComponent" in d


class TestDescriptors:
    @pytest.mark.parametrize("s", [
        "Append(Offset(input,-1),input,Offset(input,1))",
        "Sum(a,Scale(0.5,Offset(b,3)))",
        "Round(IfDefined(ivector),10)",
        "ReplaceIndex(ivector,t,0)",
        "Const(1.5,40)",
    ])
    def test_parse_print_roundtrip(self, s):
        d = Desc.parse(s)
        d2 = Desc.parse(d.to_string())
        assert d2.to_string() == d.to_string()
