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


class CostVolume(nn.Module):
    """SO(2) rotation regression head.

    Input: src/tgt equivariant maps [B, C=32, Ke, L] (Ke = ele_n - 2 middle
    elevations, L = azi_n). Output: continuous rotation bin index [B].
    """

    azi_n: int = 20
    bn_axis_name: str | None = None
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, des1: jnp.ndarray, des2: jnp.ndarray, train: bool = False):
        ax = self.bn_axis_name
        dt = self.compute_dtype
        rolled = _all_rolls(des1, self.azi_n)               # [B, C, Ke, S, L]
        cost = rolled - des2[:, :, :, None, :]              # broadcast over S
        # to channel-last [B, S, Ke, L, C] for 3D convs over (S, Ke, L)
        x = jnp.transpose(cost, (0, 3, 2, 4, 1))

        specs = [
            (32, (3, 3, 3)),
            (64, (3, 3, 3)),
            (64, (3, 1, 3)),
            (128, (3, 1, 3)),
            (128, (3, 1, 3)),
            (64, (3, 1, 3)),
            (64, (3, 1, 3)),
            (32, (3, 1, 3)),
            (32, (3, 1, 3)),
        ]
        for feats, kern in specs:
            x = ConvBNRelu(feats, kern, bn_axis_name=ax, compute_dtype=dt)(
                x, train
            )
        x = ConvBNRelu(self.azi_n, (2, 1, 2), use_bn=False, use_relu=False,
                       compute_dtype=dt)(x, train)
        # all spatial dims collapsed to 1; channels = azimuth bins
        logits = x.reshape(x.shape[0], self.azi_n)
        prob = jax.nn.softmax(logits, axis=-1)
        return jnp.sum(prob * jnp.arange(self.azi_n, dtype=prob.dtype), axis=-1)
