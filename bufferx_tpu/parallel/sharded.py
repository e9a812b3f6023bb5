"""Pair-sharded evaluation and data-parallel training over a device mesh.

``shard_map`` over a named mesh axis ("dp"): pair batches are split across
chips, each chip runs the full jitted pipeline on its shard, and training
gradients / BN statistics are ``psum``-reduced over ICI. The same functions
run on a virtual CPU mesh (``--xla_force_host_platform_device_count``) for
testing and on real slices.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from bufferx_tpu.config import Config
from bufferx_tpu.models.spinnet import MiniSpinNet
from bufferx_tpu.pipeline.registration import (
    Cloud,
    PipelineStatics,
    register_pair_jit,
)
from bufferx_tpu.train.forward import TrainStatics, desc_stage_loss

__all__ = ["make_sharded_eval", "make_sharded_train_step"]


def make_sharded_eval(params: Any, statics: PipelineStatics, mesh: Mesh,
                      axis: str = "dp"):
    """Returns ``eval_fn(src_batch: Cloud[B,...], tgt_batch, aligned[B],
    keys[B]) -> RegistrationResult[B, ...]`` with B sharded over the mesh.

    Any B is accepted: a ragged tail (B not a multiple of the mesh size) is
    padded host-side by repeating the last pair up to the next multiple, and
    the padded slots are sliced off the result. Each distinct padded size
    compiles once. Results come back sharded; the caller reduces metrics on
    host (or wraps in further psums).
    """

    def local_eval(src, tgt, aligned, keys):
        return jax.vmap(
            lambda s, t, a, k: register_pair_jit(params, statics, s, t, a, k)
        )(src, tgt, aligned, keys)

    spec = P(axis)
    cloud_spec = Cloud(xyz=spec, mask=spec)
    sharded = jax.jit(shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(cloud_spec, cloud_spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    ))
    n_shards = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))

    def eval_fn(src: Cloud, tgt: Cloud, aligned, keys):
        b = src.xyz.shape[0]
        tail = (-b) % n_shards
        if tail:
            def pad(x):
                return jnp.concatenate(
                    [x, jnp.broadcast_to(x[-1:], (tail,) + x.shape[1:])]
                )

            res = sharded(
                jax.tree.map(pad, src), jax.tree.map(pad, tgt),
                pad(aligned), pad(keys),
            )
            return jax.tree.map(lambda x: x[:b], res)
        return sharded(src, tgt, aligned, keys)

    return eval_fn


def make_sharded_train_step(cfg: Config, mesh: Mesh, optimizer=None,
                            axis: str = "dp"):
    """Data-parallel Desc-stage training step over the mesh.

    Returns ``step(variables, opt_state, batch, keys) -> (variables,
    opt_state, metrics)`` where every array in ``batch`` has a leading
    global batch axis (multiple of mesh size) sharded over ``dp``.
    Gradients and batch-norm statistics are ``psum``-averaged across the
    mesh; parameters stay replicated.
    """
    if optimizer is None:
        optimizer = optax.adam(cfg.optim.lr("Desc"))
    statics = TrainStatics.from_config(cfg)
    # BN batch stats sync over the mesh axis during training
    desc_model = MiniSpinNet(
        rad_n=cfg.patch.rad_n, ele_n=cfg.patch.ele_n, azi_n=cfg.patch.azi_n,
        bn_axis_name=axis, mode=cfg.patch.desc_mode,
        pool=cfg.patch.desc_pool, width=cfg.patch.desc_width,
    )

    def local_step(variables, opt_state, batch, keys):
        def loss_fn(p):
            def one(batch_i, key_i):
                return desc_stage_loss(
                    {**variables, "params": p}, desc_model, statics,
                    batch_i, key_i,
                )

            losses, auxes = jax.vmap(one)(batch, keys)
            # mean over local shard; batch stats from the first local sample
            aux = {
                "desc_loss": jnp.mean(auxes["desc_loss"]),
                "desc_acc": jnp.mean(auxes["desc_acc"]),
                "eqv_loss": jnp.mean(auxes["eqv_loss"]),
                "eqv_acc": jnp.mean(auxes["eqv_acc"]),
                "batch_stats": jax.tree.map(
                    lambda x: x[0], auxes["batch_stats"]
                ),
            }
            return jnp.mean(losses), aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        new_stats = jax.lax.pmean(aux.pop("batch_stats"), axis)
        metrics = jax.tree.map(lambda x: jax.lax.pmean(x, axis), aux)
        metrics["loss"] = loss

        updates, new_opt = optimizer.update(
            grads, opt_state, variables["params"]
        )
        new_params = optax.apply_updates(variables["params"], updates)
        new_vars = {
            **variables, "params": new_params, "batch_stats": new_stats
        }
        return new_vars, new_opt, metrics

    spec = P(axis)
    rep = P()
    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(rep, rep, spec, spec),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(sharded)
