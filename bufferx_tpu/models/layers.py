"""Shared neural-net building blocks: cylindrical padding + conv stacks.

The descriptor nets operate on cylindrical feature maps whose azimuth axis
is periodic: convolutions wrap around azimuth and zero-pad elevation,
reproducing ``pad_image`` / ``pad_image_3d``
(``/root/reference/utils/common.py:265-310``) with ``jnp.pad`` wrap/zero
modes. Everything is channel-last ([..., ele, azi, C]) so XLA lowers convs
directly onto the MXU.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "pad_cyl_2d",
    "pad_cyl_3d",
    "ConvBNRelu",
    "CylindricalConvNet",
    "FusedCylindricalConvNet",
    "CylindricalUNet",
]


def pad_cyl_2d(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """x: [K, ele, azi, C]; wrap azimuth, zero-pad elevation for odd k."""
    p = (k - 1) // 2
    if p == 0:
        return x
    x = jnp.pad(x, ((0, 0), (0, 0), (p, p), (0, 0)), mode="wrap")
    return jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0)))


def pad_cyl_3d(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """x: [K, rad, ele, azi, C]; wrap azimuth + zero elevation; radial axis
    unpadded (the reference's conv3d collapses rad 3 -> 1)."""
    p = (k - 1) // 2
    if p == 0:
        return x
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (p, p), (0, 0)), mode="wrap")
    return jnp.pad(x, ((0, 0), (0, 0), (p, p), (0, 0), (0, 0)))


class ConvBNRelu(nn.Module):
    """VALID conv + optional BatchNorm(affine-free) + optional ReLU.

    ``compute_dtype=bfloat16`` runs the conv on the MXU at double rate and
    halves the weight-copy traffic; BatchNorm statistics stay float32.
    """

    features: int
    kernel: Sequence[int]
    use_bn: bool = True
    use_relu: bool = True
    bn_affine: bool = False
    bn_axis_name: str | None = None
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, tuple(self.kernel), padding="VALID",
            dtype=self.compute_dtype,
        )(x.astype(self.compute_dtype))
        if self.use_bn:
            # Training computes batch statistics in f32 (bf16 accumulation
            # would corrupt the running stats). At inference BN is just a
            # per-channel affine from f32 running stats; evaluating it in
            # the compute dtype keeps the activation stream bf16
            # end-to-end (the next conv would quantize to bf16 anyway),
            # halving inter-layer HBM traffic in bf16 serving mode.
            bn_dt = jnp.float32 if train else self.compute_dtype
            x = nn.BatchNorm(
                use_running_average=not train,
                use_bias=self.bn_affine,
                use_scale=self.bn_affine,
                axis_name=self.bn_axis_name if train else None,
                momentum=0.9,
                dtype=bn_dt,
                name="BatchNorm_0",
            )(x.astype(bn_dt))
        x = x.astype(jnp.float32)
        if self.use_relu:
            x = nn.relu(x)
        return x


class CylindricalConvNet(nn.Module):
    """The descriptor backbone (reference ``Cylindrical_Net``,
    ``models/patchnet.py:68-84``): one 3x3x3 conv collapsing the radial axis,
    then seven 3x3 cylindrical convs, 32-channel affine-free output.

    Input  [K, rad=3, ele, azi, C_in]; output ([K, ele, azi, 32], mid).

    ``width`` multiplies the internal channel counts (capacity knob for
    the low-overlap band — round-5; the output ``dim`` and the parameter
    NAMES are unchanged, but widened checkpoints are shape-incompatible
    with width-1 ones, so the knob rides in the snapshot config).
    """

    dim: int = 32
    bn_axis_name: str | None = None
    compute_dtype: jnp.dtype = jnp.float32
    width: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        dt = self.compute_dtype
        w = lambda c: max(int(round(c * self.width)), 8)  # noqa: E731
        x = pad_cyl_3d(x, 3)
        x = ConvBNRelu(w(64), (3, 3, 3), bn_axis_name=ax, compute_dtype=dt)(x, train)
        x = jnp.squeeze(x, axis=1)                    # rad 3 -> 1, drop it
        mid = x
        for feats in (64, 128, 128, 64, 64):
            x = ConvBNRelu(w(feats), (3, 3), bn_axis_name=ax, compute_dtype=dt)(
                pad_cyl_2d(x, 3), train
            )
        x = ConvBNRelu(w(32), (3, 3), bn_axis_name=ax, compute_dtype=dt)(
            pad_cyl_2d(x, 3), train
        )
        x = ConvBNRelu(self.dim, (3, 3), use_bn=False, use_relu=False,
                       compute_dtype=dt)(pad_cyl_2d(x, 3), train)
        return x, mid


class _ConvBNVars(nn.Module):
    """Declares one ConvBNRelu layer's variables (same tree paths as
    :class:`ConvBNRelu`: ``Conv_0/{kernel, bias}`` params and
    ``BatchNorm_0/{mean, var}`` batch_stats) WITHOUT running its forward
    — the fused serving kernel consumes them directly."""

    kshape: tuple
    feats: int
    use_bn: bool = True

    @nn.compact
    def __call__(self):
        from bufferx_tpu.models.heads import _ConvParamHolder

        kernel, bias = _ConvParamHolder(
            self.kshape, self.feats, name="Conv_0"
        )()
        if not self.use_bn:
            return kernel, bias, None, None
        mean, var = _BNStatsHolder(self.feats, name="BatchNorm_0")()
        return kernel, bias, mean, var


class _BNStatsHolder(nn.Module):
    """Running-statistics variables of an affine-free ``nn.BatchNorm``
    (collection ``batch_stats``, names ``mean``/``var``)."""

    feats: int

    @nn.compact
    def __call__(self):
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.feats,))
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.feats,))
        )
        return mean.value, var.value


class FusedCylindricalConvNet(nn.Module):
    """Inference-only :class:`CylindricalConvNet` running as ONE fused
    Pallas program (``kernels/conv_pallas.py``): BatchNorm folded into
    the conv weights, activations VMEM-resident across all 8 layers.

    The parameter tree is IDENTICAL to ``CylindricalConvNet`` (same
    child names, shapes, collections), so the two are checkpoint- and
    init-interchangeable; numerics match the ``compute_dtype=bfloat16``
    flax path up to bf16 association (parity-tested against
    ``cyl_conv_stack_reference``). Fixed geometry: rad 3, ele 7, azi 20,
    16 stem channels. Off-TPU backends run the pure-jax mirror.
    """

    dim: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from bufferx_tpu.kernels.conv_pallas import (
            cyl_conv_stack_fused,
            cyl_conv_stack_reference,
            fold_cyl_stack,
        )

        assert not train, "fused conv stack is a serving-only path"
        assert x.shape[-4:] == (3, 7, 20, 16), x.shape
        specs = [(64, (3, 3, 3, 16, 64))] + [
            (co, (3, 3, ci, co))
            for ci, co in ((64, 64), (64, 128), (128, 128), (128, 64),
                           (64, 64), (64, 32), (32, self.dim))
        ]
        layers = []
        for i, (feats, kshape) in enumerate(specs):
            layers.append(
                _ConvBNVars(
                    kshape, feats, use_bn=i < len(specs) - 1,
                    name=f"ConvBNRelu_{i}",
                )()
            )
        w, b = fold_cyl_stack(layers)
        if jax.default_backend() == "tpu":
            out = cyl_conv_stack_fused(x, w, b, dim=self.dim)
        else:
            out = cyl_conv_stack_reference(x, w, b, dim=self.dim)
        return out, None


class CylindricalUNet(nn.Module):
    """U-Net variant of the backbone (reference ``Cylindrical_UNet``,
    ``models/patchnet.py:86-149``; unused by the default pipeline but part
    of the model inventory): conv3d stem, 3-level encoder, bottleneck, and
    a concatenation-skip decoder, all with cylindrical padding. Affine
    BatchNorm (the reference builds these with nn.BatchNorm2d defaults).

    Input [K, rad, ele, azi, C_in]; output ([K, ele, azi, dim], None).
    """

    dim: int = 32
    bn_axis_name: str | None = None
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def block(feats):
            return ConvBNRelu(
                feats, (3, 3), bn_affine=True,
                bn_axis_name=self.bn_axis_name,
                compute_dtype=self.compute_dtype,
            )

        x = ConvBNRelu(
            32, (3, 3, 3), bn_affine=True, bn_axis_name=self.bn_axis_name,
            compute_dtype=self.compute_dtype,
        )(pad_cyl_3d(x, 3), train)
        x = jnp.squeeze(x, axis=1)

        enc1 = block(32)(pad_cyl_2d(x, 3), train)
        enc2 = block(64)(pad_cyl_2d(enc1, 3), train)
        enc3 = block(128)(pad_cyl_2d(enc2, 3), train)
        bott = block(128)(pad_cyl_2d(enc3, 3), train)

        dec3 = block(64)(
            pad_cyl_2d(jnp.concatenate([bott, enc3], axis=-1), 3), train
        )
        dec2 = block(32)(
            pad_cyl_2d(jnp.concatenate([dec3, enc2], axis=-1), 3), train
        )
        dec1 = block(32)(
            pad_cyl_2d(jnp.concatenate([dec2, enc1], axis=-1), 3), train
        )
        out = block(self.dim)(pad_cyl_2d(dec1, 3), train)
        return out, None
