"""Training losses.

Ports the losses the reference trainer actually uses
(``/root/reference/trainer.py:28-30,113-141``):

- batch-hard contrastive descriptor loss with safe-radius spatial masking
  (``loss/desc_loss.py:58-107``), masked-slot aware;
- cross-entropy over the azimuth-shift logits (Desc stage);
- Huber on the predicted SO(2) index (Pose stage).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["contrastive_loss", "so2_cross_entropy", "huber_loss"]

_BIG = 1e5


def contrastive_loss(
    anchor: jnp.ndarray,     # [N, C] descriptors (source)
    positive: jnp.ndarray,   # [N, C] descriptors (target, slot-aligned)
    dist_keypts: jnp.ndarray,  # [N, N] spatial distances among *target* kpts
    valid: jnp.ndarray,      # [N] correspondence validity
    pos_margin: float = 0.1,
    neg_margin: float = 1.4,
    safe_radius: float = 0.10,
):
    """Batch-hard contrastive loss. Returns (loss, accuracy).

    Negatives within ``safe_radius`` of the positive are excluded (they are
    spatially the same point, reference ``desc_loss.py:70-73``); padded
    slots are excluded from both roles via ``valid``.
    """
    n = anchor.shape[0]
    diff = anchor[:, None, :] - positive[None, :, :]
    dists = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)   # [N, N]

    eye = jnp.eye(n, dtype=bool)
    spatial_near = (dist_keypts < safe_radius) & ~eye
    pair_invalid = ~(valid[:, None] & valid[None, :])
    dists = dists + _BIG * (spatial_near | pair_invalid).astype(dists.dtype)

    # positive distance: slot-aligned pair (the diagonal of the raw matrix)
    furthest_positive = jnp.sqrt(
        jnp.sum((anchor - positive) ** 2, axis=-1) + 1e-12
    )
    closest_negative = jnp.min(
        dists + _BIG * eye.astype(dists.dtype), axis=1
    )

    per_slot = jnp.maximum(furthest_positive - pos_margin, 0.0) + jnp.maximum(
        neg_margin - closest_negative, 0.0
    )
    vf = valid.astype(dists.dtype)
    loss = jnp.sum(per_slot * vf) / jnp.maximum(jnp.sum(vf), 1.0)
    acc = jnp.sum(
        (furthest_positive < closest_negative).astype(dists.dtype) * vf
    ) / jnp.maximum(jnp.sum(vf), 1.0)
    return loss, acc


def so2_cross_entropy(
    logits: jnp.ndarray,   # [N, azi_n] equivariant-match scores
    labels: jnp.ndarray,   # [N] integer bin labels
    valid: jnp.ndarray,    # [N]
):
    """Masked CE + accuracy on the azimuth-shift classification."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    vf = valid.astype(logits.dtype)
    loss = jnp.sum(nll * vf) / jnp.maximum(jnp.sum(vf), 1.0)
    acc = jnp.sum(
        (jnp.argmax(logits, axis=-1) == labels).astype(logits.dtype) * vf
    ) / jnp.maximum(jnp.sum(vf), 1.0)
    return loss, acc


def huber_loss(
    pred: jnp.ndarray, target: jnp.ndarray, valid: jnp.ndarray, delta: float = 1.0
):
    """Masked Huber (matches ``torch.nn.HuberLoss`` semantics)."""
    err = jnp.abs(pred - target)
    quad = jnp.minimum(err, delta)
    per = 0.5 * quad * quad + delta * (err - quad)
    vf = valid.astype(pred.dtype)
    return jnp.sum(per * vf) / jnp.maximum(jnp.sum(vf), 1.0)
