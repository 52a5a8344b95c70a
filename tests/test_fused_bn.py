"""Hand-fused batchnorm (ops/fused_bn.py + models.ChainBatchNorm) parity
against flax nn.BatchNorm: values, running-stat updates, gradients, and
checkpoint-compatible variable trees."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchain_tpu.models.tdnn import ChainBatchNorm
from torchain_tpu.ops.fused_bn import bn_train


def _pair(dtype):
    """(flax module, fused module) with identical trees."""
    ref = nn.BatchNorm(
        use_running_average=False, axis_name=None, dtype=dtype,
        name="BatchNorm_0",
    )
    fused = ChainBatchNorm(
        use_running_average=False, dtype=dtype, name="BatchNorm_0"
    )
    return ref, fused


class TestBnTrainFn:
    def test_forward_matches_flax_f32(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((6, 11, 32)), jnp.float32) * 3 + 1
        scale = jnp.asarray(rng.standard_normal(32), jnp.float32)
        bias = jnp.asarray(rng.standard_normal(32), jnp.float32)
        y, mean, var = bn_train(x, scale, bias, 1e-5)
        # reference: flax's fast-variance formula, by hand in f32
        m = x.reshape(-1, 32).mean(0)
        v = jnp.square(x.reshape(-1, 32)).mean(0) - jnp.square(m)
        want = (x - m) * jax.lax.rsqrt(v + 1e-5) * scale + bias
        np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=0, atol=2e-5)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(m), atol=1e-6)
        np.testing.assert_allclose(np.asarray(var), np.asarray(v), atol=1e-5)

    def test_gradient_matches_autodiff(self):
        """The closed-form VJP equals autodiff through the plain formula."""
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((4, 7, 16)), jnp.float32)
        scale = jnp.asarray(1 + 0.1 * rng.standard_normal(16), jnp.float32)
        bias = jnp.asarray(0.1 * rng.standard_normal(16), jnp.float32)
        tgt = jnp.asarray(rng.standard_normal((4, 7, 16)), jnp.float32)

        def loss_fused(x, s, b):
            y, _m, _v = bn_train(x, s, b, 1e-5)
            return jnp.sum((y - tgt) ** 2)

        def loss_ref(x, s, b):
            m = x.reshape(-1, 16).mean(0)
            v = jnp.maximum(jnp.square(x.reshape(-1, 16)).mean(0) - jnp.square(m), 0.0)
            y = (x - m) * jax.lax.rsqrt(v + 1e-5) * s + b
            return jnp.sum((y - tgt) ** 2)

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4)

    def test_negative_variance_clip(self):
        # constant input: fast-variance roundoff can go negative; must clip
        x = jnp.full((3, 5, 8), 7.3, jnp.float32)
        y, _m, v = bn_train(x, jnp.ones(8), jnp.zeros(8), 1e-5)
        assert np.all(np.asarray(v) >= 0)
        assert np.all(np.isfinite(np.asarray(y)))


class TestChainBatchNormModule:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_module_matches_flax(self, dtype):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((5, 9, 24)), dtype) * 2 - 0.5
        ref, fused = _pair(dtype)
        vr = ref.init(jax.random.PRNGKey(0), x)
        vf = fused.init(jax.random.PRNGKey(0), x)
        # identical tree structure (checkpoint interchangeable)
        assert jax.tree.structure(vr) == jax.tree.structure(vf)
        # seed non-trivial scale/bias into both
        sc = jnp.asarray(1 + 0.2 * rng.standard_normal(24), jnp.float32)
        bi = jnp.asarray(0.3 * rng.standard_normal(24), jnp.float32)
        for v in (vr, vf):
            v["params"]["scale"] = sc  # type: ignore[index]
            v["params"]["bias"] = bi  # type: ignore[index]
        yr, mr = ref.apply(vr, x, mutable=["batch_stats"])
        yf, mf = fused.apply(vf, x, mutable=["batch_stats"])
        tol = 1e-5 if dtype == jnp.float32 else 3e-2
        np.testing.assert_allclose(
            np.asarray(yr, np.float32), np.asarray(yf, np.float32), atol=tol
        )
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mr["batch_stats"][k]),
                np.asarray(mf["batch_stats"][k]),
                rtol=2e-5, atol=2e-5,
            )

    def test_eval_mode_uses_running_stats(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((4, 6, 12)), jnp.float32)
        ref = nn.BatchNorm(use_running_average=True, axis_name=None, name="BatchNorm_0")
        fused = ChainBatchNorm(use_running_average=True, name="BatchNorm_0")
        v = ref.init(jax.random.PRNGKey(0), x)
        v = jax.tree.map(lambda a: a, v)
        v["batch_stats"]["mean"] = jnp.asarray(
            rng.standard_normal(12), jnp.float32
        )
        v["batch_stats"]["var"] = jnp.asarray(
            np.abs(rng.standard_normal(12)) + 0.5, jnp.float32
        )
        yr = ref.apply(v, x)
        yf = fused.apply(v, x)
        np.testing.assert_allclose(np.asarray(yr), np.asarray(yf), atol=1e-5)

    def test_gradients_match_flax_module(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((3, 8, 16)), jnp.float32)
        ref, fused = _pair(jnp.float32)
        v = ref.init(jax.random.PRNGKey(0), x)

        def loss(mod, params, x):
            y, _ = mod.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, mutable=["batch_stats"],
            )
            return jnp.sum(jnp.sin(y))

        gr = jax.grad(lambda p: loss(ref, p, x))(v["params"])
        gf = jax.grad(lambda p: loss(fused, p, x))(v["params"])
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
            ),
            gr, gf,
        )
        gxr = jax.grad(lambda xx: loss(ref, v["params"], xx))(x)
        gxf = jax.grad(lambda xx: loss(fused, v["params"], xx))(x)
        np.testing.assert_allclose(np.asarray(gxr), np.asarray(gxf), rtol=2e-4, atol=2e-4)


class TestTrunkIntegration:
    def test_tdnnf_bn_impls_match(self):
        from torchain_tpu.models import TDNNF, TdnnfConfig

        rng = np.random.default_rng(5)
        base = dict(
            num_pdfs=30, hidden_dim=48, bottleneck_dim=8, prefinal_dim=16,
            num_layers=3,
        )
        cfg_a = TdnnfConfig(**base, bn_impl="flax")
        cfg_b = TdnnfConfig(**base, bn_impl="fused")
        left, right = cfg_a.context
        x = jnp.asarray(
            rng.standard_normal((2, 20 * 3 + left + right, 10)), jnp.float32
        )
        ma, mb = TDNNF(cfg_a), TDNNF(cfg_b)
        va = ma.init(jax.random.PRNGKey(1), x, train=True)
        vb = mb.init(jax.random.PRNGKey(1), x, train=True)
        assert jax.tree.structure(va) == jax.tree.structure(vb)
        (ca, xa), _ = ma.apply(va, x, train=True, mutable=["batch_stats"])
        # apply flax-initialized variables through the fused model: trees
        # are interchangeable, so this is also a checkpoint-compat check
        (cb, xb), _ = mb.apply(va, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(ca), np.asarray(cb), atol=2e-4)
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=2e-4)

    def test_conformer_bn_impls_match(self):
        from torchain_tpu.models.conformer import Conformer, ConformerConfig

        rng = np.random.default_rng(6)
        base = dict(
            num_pdfs=20, dim=32, num_layers=2, num_heads=2, ffn_mult=2,
            conv_kernel=7, prefinal_dim=16, attn_impl="einsum",
        )
        cfg_a = ConformerConfig(**base, bn_impl="flax")
        cfg_b = ConformerConfig(**base, bn_impl="fused")
        left, right = cfg_a.context
        x = jnp.asarray(
            rng.standard_normal((2, 12 * 3 + left + right, 10)), jnp.float32
        )
        ma, mb = Conformer(cfg_a), Conformer(cfg_b)
        va = ma.init(jax.random.PRNGKey(2), x, train=True)
        (ca, _), _ = ma.apply(va, x, train=True, mutable=["batch_stats"])
        (cb, _), _ = mb.apply(va, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(ca), np.asarray(cb), atol=2e-4)


class TestFusedLayerNorm:
    def test_ln_matches_flax(self):
        from torchain_tpu.ops.fused_ln import ln_apply

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((4, 9, 20)), jnp.float32) * 2 + 1
        scale = jnp.asarray(1 + 0.2 * rng.standard_normal(20), jnp.float32)
        bias = jnp.asarray(0.3 * rng.standard_normal(20), jnp.float32)
        y = ln_apply(x, scale, bias, 1e-6)
        ref = nn.LayerNorm(epsilon=1e-6)
        yr = ref.apply({"params": {"scale": scale, "bias": bias}}, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=2e-5)

    def test_ln_grad_matches_flax(self):
        from torchain_tpu.ops.fused_ln import ln_apply

        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.standard_normal((3, 6, 16)), jnp.float32)
        scale = jnp.asarray(1 + 0.1 * rng.standard_normal(16), jnp.float32)
        bias = jnp.asarray(0.1 * rng.standard_normal(16), jnp.float32)
        ref = nn.LayerNorm(epsilon=1e-6)

        def lf(x, s, b):
            return jnp.sum(jnp.sin(ln_apply(x, s, b, 1e-6)))

        def lr(x, s, b):
            return jnp.sum(
                jnp.sin(ref.apply({"params": {"scale": s, "bias": b}}, x))
            )

        g1 = jax.grad(lf, argnums=(0, 1, 2))(x, scale, bias)
        g2 = jax.grad(lr, argnums=(0, 1, 2))(x, scale, bias)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4
            )

    def test_conformer_ln_impls_match(self):
        from torchain_tpu.models.conformer import Conformer, ConformerConfig

        rng = np.random.default_rng(9)
        base = dict(
            num_pdfs=20, dim=32, num_layers=2, num_heads=2, ffn_mult=2,
            conv_kernel=7, prefinal_dim=16, attn_impl="einsum",
        )
        cfg_a = ConformerConfig(**base, ln_impl="flax")
        cfg_b = ConformerConfig(**base, ln_impl="fused")
        left, right = cfg_a.context
        x = jnp.asarray(
            rng.standard_normal((2, 12 * 3 + left + right, 10)), jnp.float32
        )
        ma, mb = Conformer(cfg_a), Conformer(cfg_b)
        va = ma.init(jax.random.PRNGKey(2), x, train=True)
        vb = mb.init(jax.random.PRNGKey(2), x, train=True)
        assert jax.tree.structure(va) == jax.tree.structure(vb)
        (ca, _), _ = ma.apply(va, x, train=True, mutable=["batch_stats"])
        (cb, _), _ = mb.apply(va, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(ca), np.asarray(cb), atol=2e-4)


class TestBrbFused:
    """bias -> relu -> batchnorm [-> bypass] fused tail (brb_train /
    brb_bypass_train) against the unfused autodiff composition."""

    def _ref(self, x, cb, scale, bias, byp, eps, bs):
        h = jnp.maximum(x + cb, 0)
        mean = jnp.mean(h, axis=(0, 1))
        var = jnp.maximum(jnp.mean(jnp.square(h), axis=(0, 1)) - mean**2, 0)
        y = (h - mean) * jax.lax.rsqrt(var + eps) * scale + bias
        if byp is not None:
            y = y + bs * byp
        return y

    @pytest.mark.parametrize("with_bypass", [False, True])
    def test_value_and_grads_match_autodiff(self, with_bypass):
        from torchain_tpu.ops.fused_bn import brb_bypass_train, brb_train

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((5, 9, 24)), jnp.float32) * 2
        cb = jnp.asarray(rng.standard_normal(24), jnp.float32)
        scale = jnp.asarray(rng.uniform(0.5, 1.5, 24), jnp.float32)
        bias = jnp.asarray(rng.standard_normal(24), jnp.float32)
        byp = (
            jnp.asarray(rng.standard_normal((5, 9, 24)), jnp.float32)
            if with_bypass
            else None
        )
        eps, bs = 1e-5, 0.66
        ct = jnp.asarray(rng.standard_normal((5, 9, 24)), jnp.float32)

        def loss_ref(*args):
            return jnp.sum(self._ref(*args, byp, eps, bs) * ct)

        if with_bypass:
            def loss_fused(x, cb, scale, bias, byp_):
                y, _m, _v = brb_bypass_train(x, cb, scale, bias, byp_, eps, bs)
                return jnp.sum(y * ct)

            def loss_ref(x, cb, scale, bias, byp_):  # noqa: F811
                return jnp.sum(self._ref(x, cb, scale, bias, byp_, eps, bs) * ct)

            args = (x, cb, scale, bias, byp)
        else:
            def loss_fused(x, cb, scale, bias):
                y, _m, _v = brb_train(x, cb, scale, bias, eps)
                return jnp.sum(y * ct)

            def loss_ref(x, cb, scale, bias):  # noqa: F811
                return jnp.sum(self._ref(x, cb, scale, bias, None, eps, bs) * ct)

            args = (x, cb, scale, bias)

        v0, g0 = jax.value_and_grad(loss_ref, argnums=tuple(range(len(args))))(*args)
        v1, g1 = jax.value_and_grad(loss_fused, argnums=tuple(range(len(args))))(*args)
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5)
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
            )

    def test_stats_match_bn_train(self):
        from torchain_tpu.ops.fused_bn import brb_train

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((4, 7, 16)), jnp.float32)
        cb = jnp.asarray(rng.standard_normal(16), jnp.float32)
        scale = jnp.ones(16, jnp.float32)
        bias = jnp.zeros(16, jnp.float32)
        y, mean, var = brb_train(x, cb, scale, bias, 1e-5)
        h = np.maximum(np.asarray(x) + np.asarray(cb), 0)
        np.testing.assert_allclose(np.asarray(mean), h.mean((0, 1)), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(var), h.var((0, 1)), rtol=1e-4, atol=1e-6
        )

    def test_tdnnf_fused_tail_eval_mode_matches_flax(self):
        """FusedPostBN's running-average path (train=False) against the
        flax BN composition, through the full TDNNF stack."""
        import jax
        from torchain_tpu.models import TDNNF, TdnnfConfig

        rng = np.random.default_rng(9)
        base = dict(
            num_pdfs=30, hidden_dim=48, bottleneck_dim=8, prefinal_dim=16,
            num_layers=3,
        )
        cfg_a = TdnnfConfig(**base, bn_impl="flax")
        cfg_b = TdnnfConfig(**base, bn_impl="fused")
        left, right = cfg_a.context
        x = jnp.asarray(
            rng.standard_normal((2, 8 * 3 + left + right, 10)), jnp.float32
        )
        ma, mb = TDNNF(cfg_a), TDNNF(cfg_b)
        va = ma.init(jax.random.PRNGKey(1), x, train=True)
        # accumulate a couple of train steps of running stats first
        for _ in range(2):
            (_, _), upd = ma.apply(va, x, train=True, mutable=["batch_stats"])
            va = {**va, "batch_stats": upd["batch_stats"]}
        ca, xa = ma.apply(va, x, train=False)
        cb, xb = mb.apply(va, x, train=False)
        np.testing.assert_allclose(np.asarray(ca), np.asarray(cb), atol=2e-4)
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=2e-4)
