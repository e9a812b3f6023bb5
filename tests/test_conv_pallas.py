"""Parity tests for the fused cylindrical conv-stack kernel
(``kernels/conv_pallas.py``): fold correctness vs the flax
``CylindricalConvNet``, Pallas-interpret vs the pure-jax mirror, the
module-level drop-in, and the custom vmap rule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bufferx_tpu.kernels.conv_pallas import (
    CYL_LAYER_CHANNELS,
    cyl_conv_stack_fused,
    cyl_conv_stack_reference,
    fold_cyl_stack,
)
from bufferx_tpu.models.layers import CylindricalConvNet, FusedCylindricalConvNet


def _random_variables(key):
    """Init the flax stack and give BatchNorm nontrivial running stats."""
    net = CylindricalConvNet(dim=32, compute_dtype=jnp.bfloat16)
    x0 = jnp.zeros((2, 3, 7, 20, 16))
    variables = net.init(key, x0, train=False)
    rng = np.random.RandomState(7)
    bs = jax.tree.map(lambda v: v, variables["batch_stats"])
    for name, sub in bs.items():
        stats = sub["BatchNorm_0"]
        stats["mean"] = jnp.asarray(
            rng.randn(*stats["mean"].shape) * 0.1, jnp.float32
        )
        stats["var"] = jnp.asarray(
            0.5 + rng.rand(*stats["var"].shape), jnp.float32
        )
    return net, {"params": variables["params"], "batch_stats": bs}


def _fold_from_variables(variables):
    layers = []
    n = len(CYL_LAYER_CHANNELS)
    for i in range(n):
        conv = variables["params"][f"ConvBNRelu_{i}"]["Conv_0"]
        if i < n - 1:
            stats = variables["batch_stats"][f"ConvBNRelu_{i}"]["BatchNorm_0"]
            layers.append(
                (conv["kernel"], conv["bias"], stats["mean"], stats["var"])
            )
        else:
            layers.append((conv["kernel"], conv["bias"], None, None))
    return fold_cyl_stack(layers)


@pytest.fixture(scope="module")
def setup():
    net, variables = _random_variables(jax.random.PRNGKey(0))
    w, b = _fold_from_variables(variables)
    x = jnp.asarray(
        np.random.RandomState(1).randn(10, 3, 7, 20, 16), jnp.float32
    )
    return net, variables, w, b, x


def test_reference_matches_flax(setup):
    """BN fold + (e,k,a) conv formulation == the flax bf16 stack."""
    net, variables, w, b, x = setup
    want, _ = net.apply(variables, x, train=False)
    got = cyl_conv_stack_reference(x, w, b)
    assert got.shape == want.shape == (10, 7, 20, 32)
    scale = float(jnp.std(want)) + 1e-9
    err = float(jnp.max(jnp.abs(got - want))) / scale
    assert err < 0.08, err        # bf16 association differences only
    mean_err = float(jnp.mean(jnp.abs(got - want))) / scale
    assert mean_err < 0.01, mean_err


def test_fused_interpret_matches_reference(setup):
    _, _, w, b, x = setup
    want = cyl_conv_stack_reference(x, w, b)
    got = cyl_conv_stack_fused(x, w, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=2e-2
    )
    # the two paths share every rounding point; demand near-bitwise
    assert float(jnp.max(jnp.abs(got - want))) < 1e-2


def test_fused_module_is_checkpoint_compatible(setup):
    """FusedCylindricalConvNet consumes CylindricalConvNet variables."""
    net, variables, _, _, x = setup
    want, _ = net.apply(variables, x, train=False)
    fused = FusedCylindricalConvNet(dim=32)
    got, mid = fused.apply(variables, x, train=False)
    assert mid is None
    scale = float(jnp.std(want)) + 1e-9
    assert float(jnp.max(jnp.abs(got - want))) / scale < 0.08
    # init trees match too (same shapes/collections)
    fresh = fused.init(jax.random.PRNGKey(3), x, train=False)
    ref_shapes = jax.tree.map(jnp.shape, variables)
    got_shapes = jax.tree.map(jnp.shape, fresh)
    assert ref_shapes == got_shapes


def test_fused_vmap_collapses_batch(setup):
    _, _, w, b, x = setup
    xb = x.reshape(2, 5, 3, 7, 20, 16)
    got = jax.vmap(
        lambda xi: cyl_conv_stack_fused(xi, w, b, interpret=True)
    )(xb)
    want = cyl_conv_stack_fused(x, w, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got.reshape(10, 7, 20, 32)), np.asarray(want),
        rtol=0, atol=1e-6,
    )


def test_fused_ragged_k_padding(setup):
    """K not divisible by the program block: padded tail is sliced off."""
    _, _, w, b, x = setup
    x3 = x[:3]
    got = cyl_conv_stack_fused(x3, w, b, interpret=True)
    want = cyl_conv_stack_fused(x, w, b, interpret=True)[:3]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=1e-6
    )
