"""Fused Pallas kernel for the 8-layer cylindrical descriptor conv stack.

Serving-path replacement for ``models/layers.py:CylindricalConvNet``
(reference ``Cylindrical_Net``, ``/root/reference/models/patchnet.py:68-84``)
with inference BatchNorm folded into the conv weights. Motivation
(RESULTS.md round 4): the conv stacks are the largest remaining block —
XLA's conv at 7x20 spatial dims reached ~23% MXU in isolation and HALF
that in context (CUMULATIVE_r4c.jsonl), because every layer round-trips
its [K, 7, 20, C] activations through HBM and the tiny spatial dims tile
poorly. This kernel keeps the activations VMEM-resident across ALL eight
layers: HBM traffic collapses to one input read + one output write for
the whole stack.

Kernel design
=============

- **Row layout (e, k, a)**: activations live as 2D ``[9*BK*20, C]`` VMEM
  scratch — elevation OUTERMOST (9 = 7 + 2 zero halo rows), then the
  ``BK`` patches of the program, then azimuth (20). Channels ride the
  128-lane axis. Two properties make the 3x3 taps cheap:

  * an **elevation tap** is a CONTIGUOUS, sublane-aligned row slice
    (``de*BK*20 : de*BK*20 + 7*BK*20`` — aligned because ``BK*20 % 8 ==
    0``), i.e. free addressing, no data movement;
  * an **azimuth tap** is a circular shift WITHIN each 20-row group:
    computed as two global sublane rolls selected by ``a % 20`` (rows
    with ``a == 0`` take ``roll(-19)`` instead of ``roll(+1)``), exactly
    reproducing the cylindrical wrap of ``pad_cyl_2d``. The zero halo
    rows reproduce the elevation zero padding.

- **Per-layer im2col-lite**: the three azimuth variants (a-1, a, a+1)
  concatenate along lanes into ``x3 [9*BK*20, 3*ci]``, so each layer is
  THREE aligned 2D matmuls ``[7*BK*20, 3*ci] @ [3*ci, co]`` (one per
  elevation tap) accumulating in f32 on the MXU — contraction width
  3*ci (384 for the 128-channel layers: three full MXU passes).

- **BN folding**: inference BatchNorm (affine-free) is a per-channel
  affine ``(x - mean) * rsqrt(var + eps)``; it folds into the conv as
  ``W' = W * s``, ``b' = (b - mean) * s`` in f32 before the kernel
  (:func:`fold_cyl_stack`). The first 3x3x3 conv collapses the radial
  axis, so it is equivalently a 2D 3x3 conv over ``3*16 = 48`` input
  channels (radial taps folded into channels).

- All eight layers' folded weights ship as ONE ``[5328, 128]`` bf16
  array (per-layer row offsets, output lanes zero-padded past ``co``)
  plus an ``[8, 128]`` f32 bias table; both have constant index maps so
  Mosaic fetches them once, not per grid program.

Numerics: activations round to bf16 between layers — the same rounding
points as the flax path in bf16 serving mode (``ConvBNRelu`` with
``compute_dtype=bfloat16``); matmuls accumulate f32 on the MXU. The BN
fold associates the per-channel scale with the weights instead of the
activations, a bf16-level (~2^-8 relative) difference — bounded by the
parity tests against :func:`cyl_conv_stack_reference` and the quality
gate (the serving checkpoint must score identically).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401  (VMEM space)

__all__ = [
    "CYL_LAYER_CHANNELS",
    "fold_cyl_stack",
    "cyl_conv_stack_fused",
    "cyl_conv_stack_reference",
]

_BK = 16          # patches per grid program (BK*20 % 8 == 0 required)
_ELE = 7
_AZI = 20
_LANES = 128

# (ci, co) per layer AFTER folding the radial axis of layer 0 into
# channels (rad_n * stem_channels = 3 * 16 = 48). Mirrors
# models/layers.py:CylindricalConvNet (64, (64, 128, 128, 64, 64), 32, dim).
CYL_LAYER_CHANNELS = (
    (48, 64), (64, 64), (64, 128), (128, 128),
    (128, 64), (64, 64), (64, 32), (32, 32),
)
_W_OFFSETS = []
_off = 0
for _ci, _co in CYL_LAYER_CHANNELS:
    _W_OFFSETS.append(_off)
    _off += 3 * 3 * _ci
_W_ROWS = _off                       # 5328


def fold_cyl_stack(layers, eps: float = 1e-5):
    """Fold inference BN into conv weights; pack for the kernel.

    ``layers``: 8 tuples ``(kernel, bias, mean, var)`` — layer 0's kernel
    is the flax [3, 3, 3, 16, co] conv3d kernel (radial axis folded here);
    layers 1..7 are [3, 3, ci, co]; the LAST layer has ``mean=None``
    (no BatchNorm). Returns ``(w [5328, 128] bf16, b [8, 128] f32)``.
    """
    assert len(layers) == len(CYL_LAYER_CHANNELS)
    w_all = jnp.zeros((_W_ROWS, _LANES), jnp.float32)
    b_all = jnp.zeros((len(layers), _LANES), jnp.float32)
    for i, (kernel, bias, mean, var) in enumerate(layers):
        ci, co = CYL_LAYER_CHANNELS[i]
        kernel = kernel.astype(jnp.float32)
        bias = bias.astype(jnp.float32)
        if i == 0:
            # [dr, de, da, m, co] -> [de, da, dr, m, co] -> [de, 3*ci, co]
            # (x48 channel order is dr*16 + m, built by the caller)
            kernel = jnp.transpose(kernel, (1, 2, 0, 3, 4))
        k3 = kernel.reshape(3, 3 * ci, co)        # rows ordered da*ci + c
        if mean is not None:
            s = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
            k3 = k3 * s[None, None, :]
            bias = (bias - mean.astype(jnp.float32)) * s
        off = _W_OFFSETS[i]
        w_all = w_all.at[off : off + 9 * ci, :co].set(k3.reshape(9 * ci, co))
        b_all = b_all.at[i, :co].set(bias)
    return w_all.astype(jnp.bfloat16), b_all


def _kernel(x_ref, w_ref, b_ref, out_ref, act_ref, x3_ref, *, bk: int,
            dim: int, debug_mode: str = "full"):
    """x_ref [7*bk*20, 48] bf16; w_ref [5328, 128] bf16; b_ref [8, 128]
    f32; out_ref [7*bk*20, dim] bf16; act [9*bk*20, 128] bf16 scratch;
    x3 [9*bk*20, 384] bf16 scratch."""
    g20 = bk * _AZI
    r7 = _ELE * g20
    r9 = (_ELE + 2) * g20

    # zero the elevation halo rows (scratch persists across programs)
    zero_halo = jnp.zeros((g20, _LANES), jnp.bfloat16)
    act_ref[0:g20, :] = zero_halo
    act_ref[8 * g20 : 9 * g20, :] = zero_halo
    act_ref[g20 : 8 * g20, : 48] = x_ref[:, :]

    # a == 0 / a == 19 row masks for the circular-azimuth roll fix
    ridx = jax.lax.broadcasted_iota(jnp.int32, (r9, 1), 0)
    a_idx = jax.lax.rem(ridx, _AZI)
    is_a0 = a_idx == 0
    is_a19 = a_idx == _AZI - 1

    for i, (ci, co) in enumerate(CYL_LAYER_CHANNELS):
        a = act_ref[:, :ci]
        if debug_mode == "full":
            # azimuth a-1 neighbor: rows shift +1; wrap (a==0) reads +19
            left = jnp.where(
                is_a0, jnp.roll(a, -(_AZI - 1), axis=0),
                jnp.roll(a, 1, axis=0)
            )
            # azimuth a+1 neighbor: rows shift -1; wrap (a==19) reads -19
            right = jnp.where(
                is_a19, jnp.roll(a, _AZI - 1, axis=0),
                jnp.roll(a, -1, axis=0)
            )
        else:                      # "norolls": perf diagnostic only
            left = a
            right = a
        if debug_mode != "nox3":
            x3_ref[:, 0:ci] = left
            x3_ref[:, ci : 2 * ci] = a
            x3_ref[:, 2 * ci : 3 * ci] = right

        off = _W_OFFSETS[i]
        y = jnp.zeros((r7, _LANES), jnp.float32)
        for de in range(3):
            if debug_mode == "nox3":   # 1/3 contraction, wrong math
                y += jnp.dot(
                    act_ref[de * g20 : de * g20 + r7, :ci].astype(
                        jnp.bfloat16
                    ),
                    w_ref[off + de * 3 * ci : off + de * 3 * ci + ci, :],
                    preferred_element_type=jnp.float32,
                )
                continue
            y += jnp.dot(
                x3_ref[de * g20 : de * g20 + r7, : 3 * ci],
                w_ref[off + de * 3 * ci : off + (de + 1) * 3 * ci, :],
                preferred_element_type=jnp.float32,
            )
        y = y + b_ref[i : i + 1, :]
        if i < len(CYL_LAYER_CHANNELS) - 1:
            y = jnp.maximum(y, 0.0)
        act_ref[g20 : 8 * g20, :co] = y[:, :co].astype(jnp.bfloat16)

    out_ref[:, :] = act_ref[g20 : 8 * g20, :dim]


def _run(x48, w, b, dim: int, bk: int, interpret: bool,
         debug_mode: str = "full"):
    """x48 [K, 7, 20, 48] bf16 -> [K, 7, 20, dim] bf16."""
    k = x48.shape[0]
    nb = -(-k // bk)
    k_pad = nb * bk
    if k_pad != k:
        x48 = jnp.pad(x48, ((0, k_pad - k), (0, 0), (0, 0), (0, 0)))
    # rows (e, k, a): block i holds patches [i*bk, (i+1)*bk)
    rows = jnp.transpose(
        x48.reshape(nb, bk, _ELE, _AZI, 48), (0, 2, 1, 3, 4)
    ).reshape(nb * _ELE * bk * _AZI, 48)
    r7 = _ELE * bk * _AZI

    out = pl.pallas_call(
        functools.partial(_kernel, bk=bk, dim=dim, debug_mode=debug_mode),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((r7, 48), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_W_ROWS, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r7, dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * r7, dim), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM(((_ELE + 2) * bk * _AZI, _LANES), jnp.bfloat16),
            pltpu.VMEM(((_ELE + 2) * bk * _AZI, 3 * _LANES), jnp.bfloat16),
        ],
        interpret=interpret,
    )(rows, w, b)

    out = jnp.transpose(
        out.reshape(nb, _ELE, bk, _AZI, dim), (0, 2, 1, 3, 4)
    ).reshape(k_pad, _ELE, _AZI, dim)
    return out[:k]


@functools.partial(
    jax.jit, static_argnames=("dim", "bk", "interpret", "debug_mode")
)
def cyl_conv_stack_fused(
    x: jnp.ndarray,          # [K, rad=3, ele=7, azi=20, 16]
    w: jnp.ndarray,          # [5328, 128] bf16 (fold_cyl_stack)
    b: jnp.ndarray,          # [8, 128] f32
    dim: int = 32,
    bk: int = _BK,
    interpret: bool = False,
    debug_mode: str = "full",
) -> jnp.ndarray:
    """Fused 8-layer cylindrical conv stack -> [K, ele, azi, dim] f32."""
    assert x.shape[1:] == (3, _ELE, _AZI, 16), x.shape
    assert (bk * _AZI) % 8 == 0

    @jax.custom_batching.custom_vmap
    def run(x5, wf, bf):
        x48 = jnp.transpose(x5, (0, 2, 3, 1, 4)).reshape(
            x5.shape[0], _ELE, _AZI, 48
        ).astype(jnp.bfloat16)
        return _run(
            x48, wf, bf, dim, bk, interpret, debug_mode
        ).astype(jnp.float32)

    @run.def_vmap
    def _rule(axis_size, in_batched, x5, wf, bf):  # noqa: ANN001
        xb, wb, bb = in_batched
        assert xb and not wb and not bb, (
            "fused conv stack: weights must be broadcast, not batched"
        )
        flat = x5.reshape((-1,) + x5.shape[2:])
        out = run(flat, wf, bf)
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    return run(x, w, b)


def cyl_conv_stack_reference(x, w, b, dim: int = 32) -> jnp.ndarray:
    """Pure-jax mirror of the kernel math (same layout, same bf16
    rounding points) — the parity oracle and the CPU fallback path.

    x [K, 3, 7, 20, 16]; w/b from :func:`fold_cyl_stack`.
    """
    k = x.shape[0]
    cur = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(
        k, _ELE, _AZI, 48
    ).astype(jnp.bfloat16)
    for i, (ci, co) in enumerate(CYL_LAYER_CHANNELS):
        off = _W_OFFSETS[i]
        wi = w[off : off + 9 * ci, :co].reshape(3, 3 * ci, co)
        left = jnp.roll(cur, 1, axis=2)
        right = jnp.roll(cur, -1, axis=2)
        x3 = jnp.concatenate([left, cur, right], axis=-1)  # [K, 7, 20, 3ci]
        x3 = jnp.pad(x3, ((0, 0), (1, 1), (0, 0), (0, 0)))
        y = jnp.zeros((k, _ELE, _AZI, co), jnp.float32)
        for de in range(3):
            y = y + jax.lax.dot_general(
                x3[:, de : de + _ELE], wi[de],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        y = y + b[i, :co]
        if i < len(CYL_LAYER_CHANNELS) - 1:
            y = jnp.maximum(y, 0.0)
        cur = y.astype(jnp.bfloat16)
    return cur[..., :dim].astype(jnp.float32)
