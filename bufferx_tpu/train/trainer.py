"""Two-stage trainer (Desc then Pose) with staged checkpoint composition.

The TPU counterpart of ``/root/reference/train.py`` + ``trainer.py``:

- per-stage optimizer: Adam + weight decay, exponential LR decay every
  ``scheduler_interval`` epochs (``train.py:51-55``);
- the *other* stage's parameters are loaded and frozen
  (``train.py:36-48``) — here simply passed as a separate frozen subtree;
- gradient-finiteness guard: non-finite grads skip the update
  (``trainer.py:146-151``) — branch-free ``where`` select inside the jitted
  step;
- per-epoch snapshots + best-on-validation checkpoint
  (``trainer.py:70-77,222-226``), serialized with flax msgpack.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Iterable

import flax.serialization
import jax
import jax.numpy as jnp
import optax

from bufferx_tpu.config import Config
from bufferx_tpu.pipeline.registration import build_models
from bufferx_tpu.train.forward import (
    TrainStatics,
    desc_stage_loss,
    pose_stage_loss,
)
from bufferx_tpu.utils.timers import AverageMeter, Timer

__all__ = ["make_optimizer", "make_train_step", "Trainer", "save_params",
           "load_params", "compose_staged_params", "save_train_state",
           "restore_train_state", "save_snapshot_config",
           "load_snapshot_config"]


def save_snapshot_config(snapshot_dir: str, cfg: Config) -> str:
    """Record the architecture knobs a checkpoint was trained with.

    ``desc_mode`` (cell pooling) and ``desc_pool`` (attention head) change
    the parameter TREE, so a checkpoint is only loadable into a model
    built with the same values — serving entry points read this file
    instead of guessing from snapshot names.
    """
    import json

    os.makedirs(snapshot_dir, exist_ok=True)
    path = os.path.join(snapshot_dir, "config.json")
    with open(path, "w") as f:
        json.dump(
            {"desc_mode": cfg.patch.desc_mode,
             "desc_pool": cfg.patch.desc_pool,
             "desc_width": cfg.patch.desc_width}, f,
        )
    return path


def load_snapshot_config(snapshot_dir: str) -> dict:
    """Patch-config overrides recorded next to a snapshot ({} if none —
    pre-round-4 snapshots default to desc_pool='gated')."""
    import json

    path = os.path.join(snapshot_dir, "config.json")
    if not os.path.exists(path):
        return {}
    try:
        with open(path) as f:
            got = json.load(f)
    except (OSError, ValueError):
        return {}
    return {k: got[k]
            for k in ("desc_mode", "desc_pool", "desc_width")
            if k in got}


def make_optimizer(cfg: Config, stage: str, steps_per_epoch: int):
    lr = optax.exponential_decay(
        init_value=cfg.optim.lr(stage),
        transition_steps=max(
            cfg.optim.scheduler_interval(stage) * steps_per_epoch, 1
        ),
        decay_rate=cfg.optim.lr_decay,
        staircase=True,
    )
    return optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.add_decayed_weights(cfg.optim.weight_decay),
        optax.adam(lr),
    )


def _all_finite(tree) -> jnp.ndarray:
    leaves = [x for x in jax.tree.leaves(tree)
              if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)]
    if not leaves:
        return jnp.asarray(True)
    return jnp.all(jnp.stack([jnp.all(jnp.isfinite(x)) for x in leaves]))


def _guarded_update(optimizer, grads, opt_state, params):
    """Apply an optimizer step only if BOTH grads and updates are finite.

    Checking grads alone is not enough: one non-finite gradient poisons
    Adam's m/v state, and on the NEXT step the gradients are finite while
    the UPDATES are NaN — a grads-only guard then writes NaN into the
    params (observed as a persistent NaN collapse at ~6k steps of a 60k
    run). The optimizer state must also be rolled back, otherwise the
    poisoned moments keep producing non-finite updates forever.
    """
    updates, new_opt = optimizer.update(grads, opt_state, params)
    cand = optax.apply_updates(params, updates)
    ok = _all_finite(grads) & _all_finite(updates)
    new_params = jax.tree.map(
        lambda n, o: jnp.where(ok, n, o), cand, params
    )
    kept_opt = jax.tree.map(
        lambda n, o: jnp.where(ok, n, o), new_opt, opt_state
    )
    return new_params, kept_opt, ok


def make_train_step(cfg: Config, stage: str, optimizer) -> Callable:
    """Returns jitted ``step(variables, opt_state, frozen, batch, key)``.

    ``variables`` is the full flax variable dict of the trainable stage
    ({'params', 'batch_stats'}); ``frozen`` is the other stage's variables
    (ignored for Desc). Returns (variables, opt_state, metrics).
    """
    if stage not in ("Desc", "Pose"):
        raise ValueError(stage)
    desc_model, pose_model = build_models(cfg)
    statics = TrainStatics.from_config(cfg)

    @jax.jit
    def step_desc(variables, opt_state, batch, key):
        def loss_fn(p):
            return desc_stage_loss(
                {**variables, "params": p}, desc_model, statics, batch, key
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        new_params, new_opt, ok = _guarded_update(
            optimizer, grads, opt_state, variables["params"]
        )
        # batch_stats must be guarded too: one non-finite forward would
        # otherwise poison the running statistics permanently
        new_stats = aux.pop("batch_stats")
        old_stats = variables.get("batch_stats", new_stats)
        stats_ok = ok & _all_finite(new_stats)
        new_vars = {
            **variables,
            "params": new_params,
            "batch_stats": jax.tree.map(
                lambda n, o: jnp.where(stats_ok, n, o), new_stats, old_stats
            ),
        }
        metrics = {k: v for k, v in aux.items()}
        metrics["loss"] = loss
        metrics["grads_finite"] = ok
        return new_vars, new_opt, metrics

    @jax.jit
    def step_pose(variables, opt_state, frozen, batch, key):
        def pose_loss(p):
            return pose_stage_loss(
                {**variables, "params": p}, frozen, desc_model, pose_model,
                statics, batch, key,
            )

        (loss, aux), grads = jax.value_and_grad(pose_loss, has_aux=True)(
            variables["params"]
        )
        new_params, new_opt, ok = _guarded_update(
            optimizer, grads, opt_state, variables["params"]
        )
        new_stats = aux.pop("batch_stats")
        old_stats = variables.get("batch_stats", new_stats)
        stats_ok = ok & _all_finite(new_stats)
        new_vars = {
            **variables,
            "params": new_params,
            "batch_stats": jax.tree.map(
                lambda n, o: jnp.where(stats_ok, n, o), new_stats, old_stats
            ),
        }
        metrics = {k: v for k, v in aux.items()}
        metrics["loss"] = loss
        metrics["grads_finite"] = ok
        return new_vars, new_opt, metrics

    return step_desc if stage == "Desc" else step_pose


def save_params(path: str, variables: Any) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(variables))
    return path


def load_params(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def compose_staged_params(desc_path: str, pose_path: str, template: dict) -> dict:
    """Merge per-stage checkpoints into the pipeline's param dict
    (the reference's staged checkpoint merge, ``test.py:87-94``).

    Device-puts the result: msgpack deserialization yields numpy arrays,
    and feeding those to a jitted function re-uploads every parameter on
    every call (ruinous over a tunneled device link)."""
    return jax.device_put(
        {
            "desc": load_params(desc_path, template["desc"]),
            "pose": load_params(pose_path, template["pose"]),
        }
    )


def save_train_state(path: str, variables, opt_state, epoch: int,
                     best_loss: float) -> str:
    """Full training state (params + optimizer + progress) for elastic
    restart — the reference has no resume story (SURVEY §5: 'needs real
    checkpoint-restart; reference offers nothing to copy')."""
    payload = {
        "variables": variables,
        "opt_state": opt_state,
        "epoch": epoch,
        "best_loss": best_loss,
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))
    os.replace(tmp, path)  # atomic: a crash mid-write never corrupts
    return path


def restore_train_state(path: str, variables_template, opt_state_template):
    """Inverse of :func:`save_train_state`; returns (variables, opt_state,
    epoch, best_loss)."""
    template = {
        "variables": variables_template,
        "opt_state": opt_state_template,
        "epoch": 0,
        "best_loss": 0.0,
    }
    with open(path, "rb") as f:
        got = flax.serialization.from_bytes(template, f.read())
    return (
        jax.device_put(got["variables"]),
        jax.device_put(got["opt_state"]),
        int(got["epoch"]),
        float(got["best_loss"]),
    )


class Trainer:
    """Host loop: epochs over a batch iterator, val-based best snapshot.

    Elastic restart: the latest full training state is written atomically
    every epoch (``state_latest.msgpack``); construct the Trainer and call
    :meth:`resume` to continue after preemption."""

    def __init__(
        self,
        cfg: Config,
        stage: str,
        variables: Any,
        frozen: Any | None,
        train_batches: Callable[[], Iterable[dict]],
        val_batches: Callable[[], Iterable[dict]] | None = None,
        steps_per_epoch: int = 100,
        snapshot_dir: str = "snapshot/run",
        log=print,
    ):
        self.cfg = cfg
        self.stage = stage
        self.variables = variables
        self.frozen = frozen
        self.train_batches = train_batches
        self.val_batches = val_batches
        self.snapshot_dir = snapshot_dir
        self.log = log
        self.optimizer = make_optimizer(cfg, stage, steps_per_epoch)
        self.opt_state = self.optimizer.init(variables["params"])
        self.step_fn = make_train_step(cfg, stage, self.optimizer)
        self.key = jax.random.PRNGKey(cfg.data.manual_seed)
        # best_loss persists ACROSS runs: a second fine-tune pass starts
        # against the existing best checkpoint's loss, so a worse run can
        # never overwrite best.msgpack (the round-3 collapse destroyed a
        # good checkpoint precisely because best_loss reset to inf here)
        self.best_loss = self._load_best_meta()
        self.start_epoch = 0

    def _best_meta_path(self) -> str:
        return os.path.join(self.snapshot_dir, self.stage, "best_meta.json")

    def _load_best_meta(self) -> float:
        import json

        path = self._best_meta_path()
        best = os.path.join(self.snapshot_dir, self.stage, "best.msgpack")
        if os.path.exists(path) and os.path.exists(best):
            try:
                with open(path) as f:
                    return float(json.load(f)["best_loss"])
            except (OSError, KeyError, ValueError):
                pass
        return float("inf")

    def _write_best_meta(self) -> None:
        import json

        os.makedirs(os.path.dirname(self._best_meta_path()), exist_ok=True)
        with open(self._best_meta_path(), "w") as f:
            json.dump({"best_loss": self.best_loss, "stage": self.stage}, f)

    def resume(self, path: str | None = None) -> bool:
        """Restore from a full training state; returns True if resumed."""
        path = path or os.path.join(
            self.snapshot_dir, self.stage, "state_latest.msgpack"
        )
        if not os.path.exists(path):
            return False
        self.variables, self.opt_state, epoch, self.best_loss = (
            restore_train_state(path, self.variables, self.opt_state)
        )
        self.start_epoch = epoch + 1
        self.log(f"resumed {self.stage} from {path} at epoch {self.start_epoch}")
        return True

    def _step(self, batch):
        self.key, sub = jax.random.split(self.key)
        if self.stage == "Desc":
            self.variables, self.opt_state, m = self.step_fn(
                self.variables, self.opt_state, batch, sub
            )
        else:
            self.variables, self.opt_state, m = self.step_fn(
                self.variables, self.opt_state, self.frozen, batch, sub
            )
        return m

    def train(self, epochs: int | None = None):
        from bufferx_tpu.train.guard import CollapseGuard

        epochs = epochs or self.cfg.train.epoch
        watch = "desc_loss" if self.stage == "Desc" else "match_loss"
        guard = CollapseGuard(patience=2) if self.stage == "Desc" else None
        for epoch in range(self.start_epoch, epochs):
            meters: dict[str, AverageMeter] = {}
            timer = Timer()
            for i, batch in enumerate(self.train_batches()):
                timer.tic()
                m = self._step(batch)
                timer.toc()
                for k, v in m.items():
                    meters.setdefault(k, AverageMeter()).update(float(v))
                if (i + 1) % 200 == 0:
                    self.log(
                        f"epoch {epoch + 1} [{i + 1}] "
                        + " ".join(
                            f"{k}:{v.avg:.4f}" for k, v in meters.items()
                        )
                        + f" step:{timer.avg:.2f}s"
                    )
            val_loss = self.evaluate() if self.val_batches else meters[
                watch
            ].avg
            self.log(
                f"epoch {epoch + 1} done: "
                + " ".join(f"{k}:{v.avg:.4f}" for k, v in meters.items())
                + f" val_{watch}:{val_loss:.4f}"
            )
            self._emit_scalars(epoch, meters, val_loss, watch)
            save_params(
                os.path.join(self.snapshot_dir, self.stage, f"{epoch}.msgpack"),
                self.variables,
            )
            save_train_state(
                os.path.join(
                    self.snapshot_dir, self.stage, "state_latest.msgpack"
                ),
                self.variables, self.opt_state, epoch, self.best_loss,
            )
            if val_loss < self.best_loss:
                self.best_loss = val_loss
                save_params(
                    os.path.join(self.snapshot_dir, self.stage, "best.msgpack"),
                    self.variables,
                )
                self._write_best_meta()
            if guard is not None and guard.update(
                epoch, {k: v.avg for k, v in meters.items()}, self.variables
            ):
                best = os.path.join(
                    self.snapshot_dir, self.stage, "best.msgpack"
                )
                self.log(
                    f"[{self.stage}] COLLAPSE at epoch {epoch + 1} "
                    "(contrastive saddle / non-finite streak) — restoring "
                    "last good state and stopping this stage"
                )
                if os.path.exists(best):
                    self.variables = jax.device_put(
                        load_params(best, self.variables)
                    )
                else:
                    self.variables = guard.restore(self.variables)
                break
        return self.variables

    def _emit_scalars(self, epoch, meters, val_loss, watch):
        """Per-epoch scalar sink: append-only JSONL next to the snapshots
        (the dependency-free counterpart of the reference's tensorboardX
        scalars, ``trainer.py:23,68``)."""
        import json

        path = os.path.join(self.snapshot_dir, self.stage, "scalars.jsonl")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        rec = dict(
            epoch=epoch,
            stage=self.stage,
            **{k: round(v.avg, 6) for k, v in meters.items()},
        )
        rec[f"val_{watch}"] = round(float(val_loss), 6)
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def evaluate(self) -> float:
        watch = "desc_loss" if self.stage == "Desc" else "match_loss"
        meter = AverageMeter()
        desc_model, pose_model = build_models(self.cfg)
        statics = TrainStatics.from_config(self.cfg)
        for batch in self.val_batches():
            self.key, sub = jax.random.split(self.key)
            if self.stage == "Desc":
                loss, aux = desc_stage_loss(
                    self.variables, desc_model, statics, batch, sub
                )
                meter.update(float(aux["desc_loss"]))
            else:
                loss, aux = pose_stage_loss(
                    self.variables, self.frozen, desc_model, pose_model,
                    statics, batch, sub,
                )
                meter.update(float(aux["match_loss"]))
        return meter.avg
