"""Farthest point sampling, TPU-native.

Replaces the ``pointnet2_ops.furthest_point_sample`` CUDA kernel used at
``/root/reference/models/BUFFERX.py:286,338``. FPS is inherently sequential
(k rounds of argmax over the running min-distance field), so the TPU design
keeps the whole loop on-chip:

- ``farthest_point_sampling``: pure-jax ``lax.fori_loop`` — works on any
  backend; the reference implementation for tests.
- ``farthest_point_sampling_pallas``: Pallas program holding the cloud and
  the min-distance field entirely in VMEM so the ~1.5k sequential rounds
  never touch HBM. Layout is [8, N/8] (full sublane utilization: reductions
  shrink 8x before the cross-lane tree) and each grid program interleaves
  ``_CB`` clouds — their per-round dependency chains (max → select →
  extract → update) are independent, so the compiler overlaps them to hide
  reduction latency. Under ``vmap`` the batch becomes the grid dimension
  (a ``custom_vmap`` rule — the auto-lifter can't batch the SMEM index
  output).

Both take a validity mask (padded slots carry a running value of -1 and can
never win the argmax; valid slots start at +inf so the first selection is
the first valid index) and return indices whose tail repeats the first
selection when ``num_samples`` exceeds the number of valid points —
downstream consumers must combine with ``valid_out``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "farthest_point_sampling",
    "farthest_point_sampling_pallas",
    "fps",
]

_CB = 2  # clouds interleaved per grid program (ILP across dependency chains)


def fps(xyz: jnp.ndarray, mask: jnp.ndarray, num_samples: int):
    """Platform dispatcher: the VMEM-resident Pallas kernel on TPU, the
    pure-jax loop elsewhere."""
    if jax.default_backend() == "tpu":
        return farthest_point_sampling_pallas(xyz, mask, num_samples)
    return farthest_point_sampling(xyz, mask, num_samples)


def _finalize(idx, mask, num_samples):
    num_valid = jnp.sum(mask.astype(jnp.int32))
    valid_out = jnp.arange(num_samples) < num_valid
    idx = jnp.where(valid_out, idx, idx[0])
    return idx, valid_out


@functools.partial(jax.jit, static_argnames=("num_samples",))
def farthest_point_sampling(
    xyz: jnp.ndarray, mask: jnp.ndarray, num_samples: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Select ``num_samples`` indices spreading over the valid points.

    xyz: [N, 3]; mask: [N] bool. Returns (idx [num_samples] int32,
    valid_out [num_samples] bool). Selection starts from the first valid
    point (the reference starts at slot 0 of a shuffled cloud; feed shuffled
    data for equivalent behavior).
    """
    mind0 = jnp.where(mask, jnp.inf, -1.0).astype(xyz.dtype)

    def body(i, state):
        mind, idx_out = state
        sel = jnp.argmax(mind).astype(jnp.int32)
        idx_out = idx_out.at[i].set(sel)
        d = jnp.sum((xyz - xyz[sel]) ** 2, axis=-1)
        # padded slots: min(-1, d>=0) stays -1, no explicit mask needed
        mind = jnp.minimum(mind, d)
        return mind, idx_out

    idx0 = jnp.zeros((num_samples,), jnp.int32)
    _, idx = jax.lax.fori_loop(0, num_samples, body, (mind0, idx0))
    return _finalize(idx, mask, num_samples)


def _fps_kernel(data_ref, idx_ref, mind_ref, *, num_samples: int, cb: int):
    """data_ref [cb, 4, 8, NL] (planes: x, y, z, initial min-distance) in
    the [8, N/8] layout (point p = row p//NL, lane p%NL); idx_ref [B, Kp]
    int32 SMEM (whole array — program ``pid`` writes rows pid*cb..);
    mind_ref [cb, 8, NL] scratch. The ``cb`` chains inside each round are
    independent — interleaved for latency hiding."""
    pid = pl.program_id(0)
    nl = data_ref.shape[3]
    iota = (
        jax.lax.broadcasted_iota(jnp.int32, (8, nl), 0) * nl
        + jax.lax.broadcasted_iota(jnp.int32, (8, nl), 1)
    )
    big = jnp.int32(8 * nl)

    for j in range(cb):
        mind_ref[j] = data_ref[j, 3]

    def body(i, _):
        for j in range(cb):
            mind = mind_ref[j]                             # [8, NL]
            m = jnp.max(mind)
            sel = jnp.min(jnp.where(mind == m, iota, big))
            idx_ref[pid * cb + j, i] = sel
            onehot = (iota == sel).astype(data_ref.dtype)
            xs = jnp.sum(data_ref[j, 0] * onehot)
            ys = jnp.sum(data_ref[j, 1] * onehot)
            zs = jnp.sum(data_ref[j, 2] * onehot)
            d = (
                (data_ref[j, 0] - xs) ** 2
                + (data_ref[j, 1] - ys) ** 2
                + (data_ref[j, 2] - zs) ** 2
            )
            mind_ref[j] = jnp.minimum(mind, d)
        return 0

    jax.lax.fori_loop(0, num_samples, body, 0)


def _pack(xyz: jnp.ndarray, mask: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """[N, 3] + [N] -> [4, 8, N_pad/8] planes (x, y, z, mind0)."""
    n = xyz.shape[0]
    mind0 = jnp.where(mask, jnp.inf, -1.0).astype(xyz.dtype)
    flat = jnp.zeros((4, n_pad), xyz.dtype).at[3].set(-1.0)
    flat = flat.at[:3, :n].set(xyz.T).at[3, :n].set(mind0)
    return flat.reshape(4, 8, n_pad // 8)


@functools.lru_cache(maxsize=None)
def _pallas_fps(num_samples: int, n_pad: int, k_pad: int, dtype_name: str):
    """Pallas call + vmap rule (batch -> grid over cloud groups)."""
    dtype = jnp.dtype(dtype_name)
    nl = n_pad // 8

    def call(data, b, cb):
        return pl.pallas_call(
            functools.partial(_fps_kernel, num_samples=num_samples, cb=cb),
            grid=(b // cb,),
            out_shape=jax.ShapeDtypeStruct((b, k_pad), jnp.int32),
            in_specs=[
                pl.BlockSpec((cb, 4, 8, nl), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.VMEM((cb, 8, nl), dtype)],
        )(data)

    @jax.custom_batching.custom_vmap
    def grid_run(data):                  # [A, 4, 8, NL] -> [A, Kp]
        a = data.shape[0]
        if a == 1:
            return call(data, 1, 1)
        a_pad = (a + _CB - 1) // _CB * _CB
        data = jnp.pad(data, ((0, a_pad - a),) + ((0, 0),) * 3)
        return call(data, a_pad, _CB)[:a]

    @grid_run.def_vmap
    def _rule(axis_size, in_batched, data):  # noqa: ANN001
        # flatten one vmap level into the grid axis; recursion through
        # grid_run handles arbitrary nesting (each level flattens once)
        if not in_batched[0]:
            data = jnp.broadcast_to(data, (axis_size,) + data.shape)
        b, a = data.shape[0], data.shape[1]
        out = grid_run(data.reshape(b * a, *data.shape[2:]))
        return out.reshape(b, a, out.shape[-1]), True

    def run(data):                       # data [4, 8, NL]
        return grid_run(data[None])[0]

    return run


@functools.partial(jax.jit, static_argnames=("num_samples",))
def farthest_point_sampling_pallas(
    xyz: jnp.ndarray, mask: jnp.ndarray, num_samples: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """VMEM-resident FPS (same contract as :func:`farthest_point_sampling`)."""
    n = xyz.shape[0]
    n_pad = (n + 1023) // 1024 * 1024
    k_pad = (num_samples + 127) // 128 * 128

    data = _pack(xyz, mask, n_pad)
    run = _pallas_fps(num_samples, n_pad, k_pad, xyz.dtype.name)
    idx = run(data)[:num_samples]
    return _finalize(idx, mask, num_samples)