"""Mini-SpinNet patch embedder (flax).

The neural half of the reference's ``MiniSpinNet``
(``/root/reference/models/patch_embedder.py:16-90``): the geometric half
(patch extraction, LRF alignment, spatial point transformer) lives in
:mod:`bufferx_tpu.geometry` as pure functions; this module consumes the SPT
output grid and produces the 32-D invariant descriptor plus the equivariant
cylindrical map.

Input:  ``mode="sampled"`` (reference semantics): inv_patches
[K, G, ns, 3], G = rad_n*ele_n*azi_n (SPT output); ``mode="moments"``
(dense cell pooling, see :mod:`bufferx_tpu.geometry.moments`): cell
features [K, G, 10] — the point-MLP + max-pool is replaced by a 1x1 conv
on the pooled moment features.
Output: dict with
  - ``desc``: [K, 32] L2-normalized invariant descriptors,
  - ``equi``: [K, 32, ele_n, azi_n] L2-normalized (over channel)
    equivariant maps — reference layout [B, C, K, L].
"""

from __future__ import annotations

import jax
import flax.linen as nn
import jax.numpy as jnp

from bufferx_tpu.models.layers import ConvBNRelu, CylindricalConvNet

__all__ = ["MiniSpinNet"]


class _MomentsMajorStem(nn.Module):
    """1x1 conv stem for MOMENTS-MAJOR input [K, 10, G] -> [K, G, 16].

    The moments pipeline keeps cells on the TPU lane axis ([K, 10, G])
    through pooling and derotation; this stem contracts the 10 moment
    channels directly from that layout (one dot_general) instead of
    forcing a [K, G, 10] relayout first. Parameter tree is IDENTICAL to
    ``ConvBNRelu(16, (1, 1), bn_affine=True)`` applied channel-last
    (child names Conv_0/kernel [1,1,10,16], bias, BatchNorm_0), so
    checkpoints are layout-independent.
    """

    features: int = 16
    bn_axis_name: str | None = None
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_mm: jnp.ndarray, train: bool = False):
        from bufferx_tpu.models.heads import _ConvParamHolder

        dt = self.compute_dtype
        cin = x_mm.shape[1]
        kernel, bias = _ConvParamHolder(
            (1, 1, cin, self.features), self.features, name="Conv_0"
        )()
        y = jax.lax.dot_general(
            x_mm.astype(dt), kernel[0, 0].astype(dt),
            (((1,), (0,)), ((), ())),
        )                                           # [K, G, 16]
        y = y + bias.astype(dt)
        bn_dt = jnp.float32 if train else dt
        y = nn.BatchNorm(
            use_running_average=not train,
            use_bias=True, use_scale=True,
            axis_name=self.bn_axis_name if train else None,
            momentum=0.9, dtype=bn_dt, name="BatchNorm_0",
        )(y.astype(bn_dt))
        return nn.relu(y.astype(jnp.float32))


def _safe_unit(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Exact L2 unit-normalization over the last axis.

    The eps clamp must stay TINY: the pooled feature norm of an untrained
    net is genuinely ~1e-6 (attention weights straddle zero and the grid
    mean cancels), so any larger clamp stops producing unit vectors and
    per-point norm variation then swamps descriptor geometry in matching.
    The 1/||v|| gradient near zero-norm features is handled where it
    belongs — the trainer's guarded update (clip + finite-checked
    params/opt-state/stats rollback), not by distorting the forward.
    """
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


class MiniSpinNet(nn.Module):
    """``pool`` selects the attention pooling head:

    - ``"gated"`` — the reference's ``pool_layer`` semantics
      (``models/patch_embedder.py:32-39``): 32->16->1 convs, BOTH gated
      through affine BN + ReLU, mean-pooled. The ReLU'd gate can saturate
      at zero ("dead attention": every cylindrical cell weighted 0, the
      pooled descriptor collapses) — diagnosed round 3 as a suspect for
      the low-overlap desc_acc ceiling.
    - ``"softmax"`` — round-4 redesign: the gate logits come from a BARE
      1x1 conv (no BN, no ReLU) and normalize through a softmax over the
      (ele, azi) grid. The attention is a proper distribution: it cannot
      die, its gradient never vanishes for every cell at once, and the
      pooled feature is a convex combination of cell features.
    """

    rad_n: int = 3
    ele_n: int = 7
    azi_n: int = 20
    dim: int = 32
    bn_axis_name: str | None = None
    compute_dtype: jnp.dtype = jnp.float32
    mode: str = "sampled"    # "sampled" | "moments"
    pool: str = "gated"      # "gated" | "softmax"
    # serving path: run the 8-layer conv stack as one fused Pallas
    # program (kernels/conv_pallas.py; checkpoint-identical param tree).
    # Silently ignored when the geometry or dtype doesn't match the
    # kernel's fixed shape, and always ignored in training.
    fused_conv: bool = False
    # conv-backbone channel multiplier (capacity knob; rides in the
    # snapshot config — widened checkpoints are shape-incompatible)
    width: float = 1.0

    @nn.compact
    def __call__(self, inv_patches: jnp.ndarray, train: bool = False):
        ax = self.bn_axis_name
        dt = self.compute_dtype
        k = inv_patches.shape[0]
        # sampled mode: [K, G, ns, 3]; moments mode: moments-major
        # [K, 10, G]
        g = inv_patches.shape[2 if self.mode == "moments" else 1]
        assert g == self.rad_n * self.ele_n * self.azi_n

        if self.mode == "moments":
            # dense cell pooling: 1x1 conv on the 10 moment features,
            # consumed in MOMENTS-MAJOR layout [K, 10, G] (cells on the
            # lane axis end-to-end through pooling + derotation; same
            # parameter tree as the old channel-last stem)
            assert inv_patches.shape[1] == 10, (
                "moments mode expects moments-major input [K, 10, G]"
            )
            x = _MomentsMajorStem(
                16, bn_axis_name=ax, compute_dtype=dt, name="ConvBNRelu_0"
            )(inv_patches, train)                           # [K, G, 16]
        else:
            # point MLP: 1x1 conv 3->16 + BN(affine) + relu, max over samples
            x = ConvBNRelu(16, (1, 1), bn_affine=True, bn_axis_name=ax,
                           compute_dtype=dt,
                           name="ConvBNRelu_0")(inv_patches, train)                                                   # [K, G, ns, 16]
            x = jnp.max(x, axis=2)                          # [K, G, 16]
        x = x.reshape(k, self.rad_n, self.ele_n, self.azi_n, 16)

        use_fused = (
            self.fused_conv
            and not train
            and (self.rad_n, self.ele_n, self.azi_n) == (3, 7, 20)
            and self.compute_dtype == jnp.bfloat16
            and self.width == 1.0
        )
        if use_fused:
            from bufferx_tpu.models.layers import FusedCylindricalConvNet

            x, _mid = FusedCylindricalConvNet(
                dim=self.dim, name="CylindricalConvNet_0"
            )(x, train)
        else:
            x, _mid = CylindricalConvNet(
                dim=self.dim, bn_axis_name=ax, compute_dtype=dt,
                width=self.width, name="CylindricalConvNet_0",
            )(x, train)
        # x: [K, ele, azi, 32]

        # attention pooling (see class docstring for the two designs)
        w = ConvBNRelu(16, (1, 1), bn_affine=True, bn_axis_name=ax,
                       compute_dtype=dt, name="ConvBNRelu_1")(x, train)
        if self.pool == "softmax":
            logits = ConvBNRelu(1, (1, 1), use_bn=False, use_relu=False,
                                compute_dtype=dt,
                                name="ConvBNRelu_2")(w, train)
            att = jax.nn.softmax(
                logits.reshape(k, -1), axis=-1
            ).reshape(logits.shape)
            f = jnp.sum(x * att, axis=(1, 2))               # [K, 32]
        else:
            w = ConvBNRelu(1, (1, 1), bn_affine=True, bn_axis_name=ax,
                           compute_dtype=dt, name="ConvBNRelu_2")(w, train)
            f = jnp.mean(x * w, axis=(1, 2))                # [K, 32]
        # ``f`` is f32 here (ConvBNRelu casts back after BN), so the norm
        # accumulates in f32 even in bf16 serving mode. _safe_unit keeps a
        # TINY clamp (see its docstring); its 1/||f|| gradient near
        # zero-norm features is handled by the trainer's guarded update,
        # not by distorting the forward.
        f = _safe_unit(f)
        equi = _safe_unit(x)
        equi = jnp.transpose(equi, (0, 3, 1, 2))            # [K, C, ele, azi]
        return {"desc": f, "equi": equi}
