"""Model-layer tests: shapes, equivariance properties, parameter counts."""

import jax
import jax.numpy as jnp
import numpy as np

from bufferx_tpu.models import CostVolume, MiniSpinNet, equi_match_scores

RAD, ELE, AZI = 3, 7, 20
G = RAD * ELE * AZI


def init_spinnet(key, k=4, ns=10):
    model = MiniSpinNet(rad_n=RAD, ele_n=ELE, azi_n=AZI)
    x = jnp.zeros((k, G, ns, 3))
    variables = model.init(key, x, train=False)
    return model, variables


class TestMiniSpinNet:
    def test_shapes_and_norms(self, rng):
        model, variables = init_spinnet(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.randn(4, G, 10, 3).astype(np.float32) * 0.3)
        out = model.apply(variables, x, train=False)
        assert out["desc"].shape == (4, 32)
        assert out["equi"].shape == (4, 32, ELE, AZI)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out["desc"]), axis=-1), 1.0, atol=1e-5
        )
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out["equi"]), axis=1), 1.0, atol=1e-4
        )

    def test_param_count_sub_million(self):
        _, variables = init_spinnet(jax.random.PRNGKey(0))
        n = sum(p.size for p in jax.tree.leaves(variables["params"]))
        assert n < 1_000_000, n  # reference logs a sub-1M model

    def test_train_mode_updates_batch_stats(self, rng):
        model, variables = init_spinnet(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.randn(4, G, 10, 3).astype(np.float32))
        out, mutated = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        assert "batch_stats" in mutated
        changed = jax.tree.map(
            lambda a, b: np.abs(np.asarray(a) - np.asarray(b)).max(),
            variables["batch_stats"],
            mutated["batch_stats"],
        )
        assert max(jax.tree.leaves(changed)) > 0


class TestEquiMatch:
    def test_self_correlation_peaks_at_zero_shift(self, rng):
        des = jnp.asarray(rng.randn(3, 32, ELE, AZI).astype(np.float32))
        des = des / jnp.linalg.norm(des, axis=1, keepdims=True)
        scores = equi_match_scores(des, des, AZI)
        assert scores.shape == (3, AZI)
        np.testing.assert_array_equal(np.argmax(np.asarray(scores), -1), 0)

    def test_rolled_input_shifts_peak(self, rng):
        des = jnp.asarray(rng.randn(2, 32, ELE, AZI).astype(np.float32))
        shift = 5
        # des2 = des1 rolled by `shift` along azimuth: peak moves to `shift`
        des2 = jnp.roll(des, shift, axis=-1)
        scores = equi_match_scores(des, des2, AZI)
        np.testing.assert_array_equal(np.argmax(np.asarray(scores), -1), shift)


class TestCostVolume:
    def test_output_range_and_shape(self, rng):
        model = CostVolume(azi_n=AZI)
        d1 = jnp.asarray(rng.randn(6, 32, ELE - 2, AZI).astype(np.float32))
        d2 = jnp.asarray(rng.randn(6, 32, ELE - 2, AZI).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), d1, d2, train=False)
        ind = model.apply(variables, d1, d2, train=False)
        assert ind.shape == (6,)
        assert np.all(np.asarray(ind) >= 0) and np.all(np.asarray(ind) < AZI)

    def test_grad_flows(self, rng):
        model = CostVolume(azi_n=AZI)
        d1 = jnp.asarray(rng.randn(2, 32, ELE - 2, AZI).astype(np.float32))
        d2 = jnp.asarray(rng.randn(2, 32, ELE - 2, AZI).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), d1, d2, train=False)

        def loss(params):
            ind = model.apply({**variables, "params": params}, d1, d2, train=False)
            return jnp.sum((ind - 3.0) ** 2)

        g = jax.grad(loss)(variables["params"])
        total = sum(np.abs(np.asarray(x)).sum() for x in jax.tree.leaves(g))
        assert total > 0


class TestSoftmaxPool:
    """Round-4 pool redesign: softmax attention cannot die."""

    def test_forward_and_tree_shape(self, rng=None):
        import numpy as np

        from bufferx_tpu.models.spinnet import MiniSpinNet

        net = MiniSpinNet(rad_n=3, ele_n=5, azi_n=8, mode="moments",
                          pool="softmax")
        x = jnp.asarray(np.random.RandomState(0).randn(3, 10, 3 * 5 * 8),
                        jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), x, train=False)
        out = net.apply(variables, x, train=False)
        assert out["desc"].shape == (3, 32)
        assert out["equi"].shape == (3, 32, 5, 8)
        # descriptors unit-norm and finite
        n = jnp.linalg.norm(out["desc"], axis=-1)
        assert bool(jnp.all(jnp.isfinite(out["desc"])))
        assert bool(jnp.all(jnp.abs(n - 1.0) < 1e-4))
        # the logits head is BARE: its ConvBNRelu must carry no BatchNorm
        p = variables["params"]
        assert "BatchNorm_0" not in p["ConvBNRelu_2"], (
            "softmax pool logits must not pass through BN"
        )

    def test_gated_pool_can_die_softmax_cannot(self):
        """With pathological gate weights, the gated pool zeroes every
        cell (degenerate pooled features); softmax still yields a convex
        combination of cell features."""
        import numpy as np

        from bufferx_tpu.models.spinnet import MiniSpinNet

        rs = np.random.RandomState(1)
        x = jnp.asarray(rs.randn(2, 10, 3 * 5 * 8), jnp.float32)
        for pool in ("gated", "softmax"):
            net = MiniSpinNet(rad_n=3, ele_n=5, azi_n=8, mode="moments",
                              pool=pool)
            variables = net.init(jax.random.PRNGKey(0), x, train=False)
            # drive the gate conv bias very negative -> ReLU kills the
            # gated attention everywhere; softmax renormalizes instead
            p = jax.tree.map(lambda v: v, variables["params"])
            last = p["ConvBNRelu_2"]
            last["Conv_0"]["bias"] = last["Conv_0"]["bias"] - 100.0
            out = net.apply({**variables, "params": p}, x, train=False)
            pre_norm_dead = bool(
                jnp.all(jnp.abs(out["desc"]) < 1.0) and
                jnp.all(jnp.isfinite(out["desc"]))
            )
            assert pre_norm_dead  # both stay finite (the _safe_unit clamp)
            if pool == "softmax":
                # attention renormalizes: descriptors remain unit-norm and
                # genuinely feature-dependent (distinct across patches)
                d = out["desc"]
                assert float(jnp.linalg.norm(d[0] - d[1])) > 1e-3


class TestFactoredCostVolume:
    """The Toeplitz-factored CostNet stem must match the direct cost-volume
    conv exactly (same math, same parameter tree)."""

    def test_matches_naive_and_shares_tree(self):
        import numpy as np

        from bufferx_tpu.models.heads import CostVolume

        rs = np.random.RandomState(0)
        d1 = jnp.asarray(rs.randn(3, 32, 5, 20), jnp.float32)
        d2 = jnp.asarray(rs.randn(3, 32, 5, 20), jnp.float32)

        naive = CostVolume(azi_n=20, factored=False)
        fact = CostVolume(azi_n=20, factored=True)
        variables = naive.init(jax.random.PRNGKey(0), d1, d2, train=False)
        v2 = fact.init(jax.random.PRNGKey(0), d1, d2, train=False)
        # identical parameter trees -> checkpoints are interchangeable
        assert jax.tree.structure(variables) == jax.tree.structure(v2)
        for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(v2)):
            assert a.shape == b.shape

        out_n = naive.apply(variables, d1, d2, train=False)
        out_f = fact.apply(variables, d1, d2, train=False)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_n), atol=2e-4
        )

    def test_matches_in_train_mode_with_stats(self):
        import numpy as np

        from bufferx_tpu.models.heads import CostVolume

        rs = np.random.RandomState(1)
        d1 = jnp.asarray(rs.randn(2, 32, 5, 20), jnp.float32)
        d2 = jnp.asarray(rs.randn(2, 32, 5, 20), jnp.float32)
        naive = CostVolume(azi_n=20, factored=False)
        fact = CostVolume(azi_n=20, factored=True)
        variables = naive.init(jax.random.PRNGKey(0), d1, d2, train=False)
        on, sn = naive.apply(variables, d1, d2, train=True,
                             mutable=["batch_stats"])
        of, sf = fact.apply(variables, d1, d2, train=True,
                            mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(of), np.asarray(on), atol=2e-4)
        for a, b in zip(jax.tree.leaves(sn), jax.tree.leaves(sf)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-5)
