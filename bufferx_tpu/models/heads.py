"""Matching heads: equivariant correlation + SO(2) cost volume.

- ``equi_match_scores``: circular cross-correlation of two equivariant maps
  over all azimuth shifts (reference ``EquiMatch``,
  ``models/BUFFERX.py:16-36``) — the Desc-stage classification logits.
- ``CostVolume``: cyclic-shift difference volume + 10-layer 3D conv stack
  (reference ``CostVolume`` + ``CostNet``, ``models/BUFFERX.py:39-69`` and
  ``models/patchnet.py:192-210``), softmax-expectation over azimuth bins
  producing a continuous SO(2) rotation index per correspondence.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from bufferx_tpu.models.layers import ConvBNRelu

__all__ = ["equi_match_scores", "CostVolume"]


def _all_rolls(des: jnp.ndarray, azi_n: int) -> jnp.ndarray:
    """des [..., L] -> [..., shift, L] with out[..., i, l] = des[..., (l-i)%L]."""
    l_idx = jnp.arange(azi_n)
    gather = (l_idx[None, :] - l_idx[:, None]) % azi_n      # [shift, L]
    return des[..., gather]


def equi_match_scores(des1: jnp.ndarray, des2: jnp.ndarray, azi_n: int):
    """Correlation over cyclic shifts: [B, C, K, L] x2 -> [B, azi_n]."""
    rolled = _all_rolls(des1, azi_n)                        # [B, C, K, S, L]
    return jnp.einsum(
        "bcksl,bckl->bs", rolled, des2, precision=jax.lax.Precision.HIGHEST
    )


class _ConvParamHolder(nn.Module):
    """Parameters of an ``nn.Conv`` (same names, shapes, initializers)
    WITHOUT its forward — for layers whose math is applied in a factored
    form while staying checkpoint-compatible with the direct conv."""

    shape: tuple
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _FactoredCostStem(nn.Module):
    """CostNet layer 1 in factored (Toeplitz) form.

    The cost volume is ``cost[s, ke, l] = des1[ke, (l-s) % L] - des2[ke, l]``
    — a circulant minus a shift-constant tensor — and the first conv is
    linear, so its output decomposes WITHOUT materializing the
    [B, S, Ke, L, C] input (384 MB/pair/scale at production shapes) or
    spending S x redundant MACs:

    - ``conv(rolled(des1))[s, ke', l]`` depends only on ``(l - s) % L``:
      it equals a small CIRCULAR 2D conv ``A[ke', m]`` over (ele, m) with
      the anti-diagonal-summed kernel ``W1[dke, dm] = sum_ds W[ds, dke,
      ds + dm]`` (~20x fewer MACs than the direct 3D conv).
    - ``conv(broadcast(des2))`` is constant along s: a VALID 2D conv with
      the ds-summed kernel ``W2[dke, dl] = sum_ds W[ds, dke, dl]``.
    - layer-1 output reconstructs as ``A[ke', (l-s) % L] - C[ke', l] +
      bias`` — the [B, S, Ke-2, L-2, C2] tensor that layer 2 needs anyway.

    BatchNorm/ReLU are pointwise and apply on the reconstruction, so the
    output is bit-identical (up to float association) to the direct path;
    the parameter tree (``Conv_0``/``BatchNorm_0``) is unchanged.
    """

    azi_n: int
    features: int = 32
    bn_axis_name: str | None = None
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, des1: jnp.ndarray, des2: jnp.ndarray, train: bool):
        dt = self.compute_dtype
        cin = des1.shape[1]
        L = self.azi_n
        kernel, bias = _ConvParamHolder(
            (3, 3, 3, cin, self.features), self.features, name="Conv_0"
        )()
        kernel = kernel.astype(dt)
        d1 = jnp.transpose(des1, (0, 2, 3, 1)).astype(dt)   # [B, Ke, L, C]
        d2 = jnp.transpose(des2, (0, 2, 3, 1)).astype(dt)

        # W1[dke, dmi] = sum_ds W[ds, dke, ds + dmi - 2], dmi in [0, 5)
        w1 = jnp.stack(
            [
                sum(
                    kernel[ds, :, ds + dmi - 2]
                    for ds in range(3)
                    if 0 <= ds + dmi - 2 <= 2
                )
                for dmi in range(5)
            ],
            axis=1,
        )                                                   # [3, 5, C, C2]
        w2 = jnp.sum(kernel, axis=0)                        # [3, 3, C, C2]

        dn = ("NHWC", "HWIO", "NHWC")
        a_in = jnp.pad(d1, ((0, 0), (0, 0), (2, 2), (0, 0)), mode="wrap")
        A = jax.lax.conv_general_dilated(
            a_in, w1, (1, 1), "VALID", dimension_numbers=dn,
            preferred_element_type=dt,
        )                                                   # [B, Ke-2, L, C2]
        C2d = jax.lax.conv_general_dilated(
            d2, w2, (1, 1), "VALID", dimension_numbers=dn,
            preferred_element_type=dt,
        )                                                   # [B, Ke-2, L-2, C2]

        # recon[..., s, l, :] = A[..., (l - s) % L, :]: materialize via
        # L-2 STATIC rolls (each lowers to two slices + a concat) instead
        # of a [B, Ke-2, S, L'] advanced-index gather — TPU gathers cost
        # per ROW regardless of width, and this one had ~10M rows per
        # batched call at production shapes.
        recon = jnp.stack(
            [
                jnp.roll(A, s, axis=2)[:, :, : L - 2, :]
                for s in range(L - 2)
            ],
            axis=1,
        )                                                   # [B, S, Ke-2, L', C2]
        x = recon - C2d[:, None] + bias.astype(dt)
        x = nn.BatchNorm(
            use_running_average=not train,
            use_bias=False, use_scale=False,
            axis_name=self.bn_axis_name if train else None,
            momentum=0.9, dtype=jnp.float32, name="BatchNorm_0",
        )(x.astype(jnp.float32))
        return nn.relu(x)


class CostVolume(nn.Module):
    """SO(2) rotation regression head.

    Input: src/tgt equivariant maps [B, C=32, Ke, L] (Ke = ele_n - 2 middle
    elevations, L = azi_n). Output: continuous rotation bin index [B].

    ``factored=True`` (default) computes layer 1 via
    :class:`_FactoredCostStem` — same math and the same parameter tree as
    the direct cost-volume conv, at ~20x fewer stem MACs and without
    materializing the full [B, S, Ke, L, C] cost tensor.
    """

    azi_n: int = 20
    bn_axis_name: str | None = None
    compute_dtype: jnp.dtype = jnp.float32
    factored: bool = True

    @nn.compact
    def __call__(self, des1: jnp.ndarray, des2: jnp.ndarray, train: bool = False):
        ax = self.bn_axis_name
        dt = self.compute_dtype

        if self.factored:
            x = _FactoredCostStem(
                azi_n=self.azi_n, features=32, bn_axis_name=ax,
                compute_dtype=dt, name="ConvBNRelu_0",
            )(des1, des2, train)
        else:
            rolled = _all_rolls(des1, self.azi_n)           # [B, C, Ke, S, L]
            cost = rolled - des2[:, :, :, None, :]          # broadcast over S
            # to channel-last [B, S, Ke, L, C] for 3D convs over (S, Ke, L)
            x = jnp.transpose(cost, (0, 3, 2, 4, 1))
            x = ConvBNRelu(32, (3, 3, 3), bn_axis_name=ax, compute_dtype=dt,
                           name="ConvBNRelu_0")(x, train)

        specs = [
            (64, (3, 3, 3)),
            (64, (3, 1, 3)),
            (128, (3, 1, 3)),
            (128, (3, 1, 3)),
            (64, (3, 1, 3)),
            (64, (3, 1, 3)),
            (32, (3, 1, 3)),
            (32, (3, 1, 3)),
        ]
        for i, (feats, kern) in enumerate(specs):
            x = ConvBNRelu(feats, kern, bn_axis_name=ax, compute_dtype=dt,
                           name=f"ConvBNRelu_{i + 1}")(x, train)
        x = ConvBNRelu(self.azi_n, (2, 1, 2), use_bn=False, use_relu=False,
                       compute_dtype=dt, name="ConvBNRelu_9")(x, train)
        # all spatial dims collapsed to 1; channels = azimuth bins
        logits = x.reshape(x.shape[0], self.azi_n)
        prob = jax.nn.softmax(logits, axis=-1)
        return jnp.sum(prob * jnp.arange(self.azi_n, dtype=prob.dtype), axis=-1)
