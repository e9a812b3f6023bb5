"""Training-collapse detection and last-good-state rescue.

Round-3 postmortem (RESULTS.md): the contrastive Desc stage has a
positives-unlearnable saddle at ``desc_loss == neg_margin - pos_margin``
(1.30 with the default margins) where ``desc_acc`` pins to its floor; a
second fine-tune pass at low LR re-entered it, collapsed the descriptor,
and overwrote the good checkpoint — the run had to be discarded by hand.

:class:`CollapseGuard` automates the rescue: callers feed it the scalar
metrics they already emit plus the current variables; it keeps a host-side
snapshot of the last HEALTHY state and reports a collapse once the saddle
signature (or persistent non-finite grads) has been seen ``patience``
consecutive times. On collapse the caller restores
:attr:`last_good_variables` and stops the stage — making a collapsing
fine-tune a no-op instead of a catastrophe.

The reference has no counterpart (its trainer dies or silently degrades;
``/root/reference/trainer.py:146-151`` only skips single non-finite
steps).
"""

from __future__ import annotations

from typing import Any

import jax

__all__ = ["CollapseGuard"]


class CollapseGuard:
    """Saddle/divergence detector with last-good-state snapshotting.

    Collapse signature (any of, ``patience`` consecutive observations):

    - ``desc_loss`` within ``tol`` of the contrastive saddle value
      (``neg_margin - pos_margin``) while ``desc_acc`` is under
      ``acc_floor`` — the positives-unlearnable fixed point;
    - ``desc_acc`` under ``acc_floor`` after the run has already proven it
      can exceed ``2 * acc_floor`` (a crash, not a slow start);
    - ``grads_finite`` false (the guarded update is rejecting steps).

    ``update`` returns ``True`` when training should stop. While healthy,
    it snapshots ``variables`` to host (a few MB for these models) so the
    caller can restore the most recent good state.
    """

    def __init__(
        self,
        saddle_value: float = 1.4 - 0.1,
        tol: float = 0.02,
        acc_floor: float = 0.05,
        patience: int = 6,
        detect_crash: bool = True,
    ):
        self.saddle_value = saddle_value
        self.tol = tol
        self.acc_floor = acc_floor
        self.patience = patience
        # The acc-crash criterion assumes a STATIONARY data distribution:
        # under a hardness curriculum, a phase transition legitimately
        # drops desc_acc below the floor (observed: a healthy run guard-
        # stopped 200 steps into its phase-2 pool), so curriculum trainers
        # disable it and rely on the saddle signature + non-finite streaks,
        # which are distribution-independent.
        self.detect_crash = detect_crash
        self.bad_streak = 0
        self.seen_healthy_acc = False
        self.last_good_variables: Any = None
        self.last_good_step: int = -1
        self.collapsed = False

    def _is_bad(self, metrics: dict) -> bool:
        if float(metrics.get("grads_finite", 1.0)) < 0.5:
            return True
        dl = metrics.get("desc_loss")
        da = metrics.get("desc_acc")
        if da is not None and float(da) >= 2.0 * self.acc_floor:
            self.seen_healthy_acc = True
        if dl is not None and da is not None:
            at_saddle = (
                abs(float(dl) - self.saddle_value) <= self.tol
                and float(da) < self.acc_floor
            )
            crashed = (
                self.detect_crash
                and self.seen_healthy_acc
                and float(da) < self.acc_floor
            )
            return at_saddle or crashed
        return False

    def update(self, step: int, metrics: dict, variables: Any) -> bool:
        """Observe one metrics emission; returns True on collapse."""
        if self.collapsed:
            return True
        if self._is_bad(metrics):
            self.bad_streak += 1
        else:
            self.bad_streak = 0
            self.last_good_variables = jax.device_get(variables)
            self.last_good_step = step
        if self.bad_streak >= self.patience:
            self.collapsed = True
        return self.collapsed

    def restore(self, fallback: Any) -> Any:
        """Last healthy variables (device-put), or ``fallback`` if the run
        never produced one (instant collapse -> keep the initial state)."""
        good = self.last_good_variables
        return jax.device_put(good) if good is not None else fallback
