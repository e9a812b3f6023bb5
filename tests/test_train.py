"""Training-layer tests: losses, SO(2) labels, train steps reduce loss."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bufferx_tpu.config import make_cfg
from bufferx_tpu.core.se3 import rotation_z
from bufferx_tpu.data.training import build_training_batch, synthetic_training_stream
from bufferx_tpu.data.modelnet import synthetic_pair_full_overlap
from bufferx_tpu.pipeline.registration import init_params
from bufferx_tpu.train.forward import (
    cal_so2_gt,
    sample_gt_correspondences,
)
from bufferx_tpu.train.losses import contrastive_loss, huber_loss, so2_cross_entropy
from bufferx_tpu.train.trainer import (
    compose_staged_params,
    make_optimizer,
    make_train_step,
    save_params,
)


def tiny_cfg():
    return make_cfg("ModelNet40").override(
        capacity=dict(max_points=1024, sphere_query_chunk=32),
        patch=dict(num_points_per_patch=64),
        train=dict(pos_num=32),
    )


class TestLosses:
    def test_contrastive_perfect_descriptors(self, rng):
        # identical anchor/positive, all others far: loss ~ margin terms only
        desc = np.eye(8, 16, dtype=np.float32) * 2
        kd = np.full((8, 8), 10.0, np.float32)
        loss, acc = contrastive_loss(
            jnp.asarray(desc), jnp.asarray(desc), jnp.asarray(kd),
            jnp.ones(8, bool),
        )
        assert float(acc) == 1.0
        assert float(loss) < 0.1

    def test_contrastive_ignores_invalid(self, rng):
        desc = rng.randn(8, 16).astype(np.float32)
        kd = np.full((8, 8), 10.0, np.float32)
        full, _ = contrastive_loss(
            jnp.asarray(desc), jnp.asarray(desc), jnp.asarray(kd),
            jnp.ones(8, bool),
        )
        # corrupt invalid slots: loss must not change
        desc2 = desc.copy()
        desc2[4:] = 1000.0
        valid = np.zeros(8, bool)
        valid[:4] = True
        a, _ = contrastive_loss(
            jnp.asarray(desc), jnp.asarray(desc), jnp.asarray(kd),
            jnp.asarray(valid),
        )
        b, _ = contrastive_loss(
            jnp.asarray(desc2), jnp.asarray(desc), jnp.asarray(kd),
            jnp.asarray(valid),
        )
        # anchor corruption in invalid slots does not affect masked loss
        # (their rows are excluded; columns are pushed out by pair_invalid)
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5)

    def test_safe_radius_exclusion(self):
        # two identical descriptors at nearby *positions* must not be
        # negatives of each other
        desc = np.zeros((2, 4), np.float32)
        desc[:, 0] = 1.0  # identical
        kd_near = np.full((2, 2), 0.01, np.float32)  # spatially near
        loss_near, _ = contrastive_loss(
            jnp.asarray(desc), jnp.asarray(desc), jnp.asarray(kd_near),
            jnp.ones(2, bool),
        )
        kd_far = np.full((2, 2), 10.0, np.float32)
        loss_far, _ = contrastive_loss(
            jnp.asarray(desc), jnp.asarray(desc), jnp.asarray(kd_far),
            jnp.ones(2, bool),
        )
        # near duplicates excluded -> no negative pressure -> smaller loss
        assert float(loss_near) < float(loss_far)

    def test_huber(self):
        pred = jnp.asarray([0.0, 3.0])
        tgt = jnp.asarray([0.5, 0.0])
        v = jnp.ones(2, bool)
        # |0.5| -> quadratic 0.125 ; |3| -> 0.5 + 2.5*1 = 3 - 0.5 = 2.5
        np.testing.assert_allclose(
            float(huber_loss(pred, tgt, v)), (0.125 + 2.5) / 2, rtol=1e-6
        )

    def test_so2_ce_masked(self, rng):
        logits = rng.randn(6, 20).astype(np.float32)
        labels = rng.randint(0, 20, 6)
        valid = np.array([1, 1, 1, 0, 0, 0], bool)
        loss, acc = so2_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid)
        )
        # only first three rows matter
        logits2 = logits.copy()
        logits2[3:] = 100.0
        loss2, _ = so2_cross_entropy(
            jnp.asarray(logits2), jnp.asarray(labels), jnp.asarray(valid)
        )
        np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-5)


class TestSO2GT:
    def test_pure_z_rotation_global_frame(self):
        # global-z case: LRFs identity, rand_axis = x̂; a GT z-rotation by
        # k bins must produce label k
        azi_n = 20
        k = 7
        K = 5
        gt_R = np.asarray(rotation_z(jnp.asarray(2 * np.pi * k / azi_n)))
        rand_axis = np.tile([1.0, 0.0, 0.0], (K, 1)).astype(np.float32)
        eye = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
        # NOTE label measures src-axis vs projected target axis: with
        # identity LRFs the deviation angle equals the GT azimuth rotation
        labels = cal_so2_gt(
            jnp.asarray(rand_axis), jnp.asarray(eye), jnp.asarray(eye),
            jnp.asarray(gt_R.astype(np.float32)), azi_n, integer=True,
        )
        np.testing.assert_array_equal(np.asarray(labels), k)

    def test_float_labels_continuous(self):
        azi_n = 20
        theta = 2 * np.pi * 3.4 / azi_n
        gt_R = np.asarray(rotation_z(jnp.asarray(theta)))
        rand_axis = np.tile([1.0, 0.0, 0.0], (2, 1)).astype(np.float32)
        eye = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
        labels = cal_so2_gt(
            jnp.asarray(rand_axis), jnp.asarray(eye), jnp.asarray(eye),
            jnp.asarray(gt_R.astype(np.float32)), azi_n, integer=False,
        )
        np.testing.assert_allclose(np.asarray(labels), 3.4, atol=1e-3)


class TestGtCorrespondences:
    def test_exact_pairs(self, rng):
        n = 256
        src = rng.randn(n, 3).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [1.0, 0.0, 0.0]
        tgt = src + np.array([1.0, 0.0, 0.0], np.float32)
        s, t, v = sample_gt_correspondences(
            jnp.asarray(src), jnp.ones(n, bool),
            jnp.asarray(tgt), jnp.ones(n, bool),
            jnp.asarray(T), jnp.float32(0.05), jax.random.PRNGKey(0), 64,
        )
        assert np.asarray(v).all()
        np.testing.assert_allclose(
            np.asarray(s) + [1, 0, 0], np.asarray(t), atol=1e-5
        )

    def test_no_matches(self, rng):
        src = rng.randn(64, 3).astype(np.float32)
        tgt = src + 100.0
        s, t, v = sample_gt_correspondences(
            jnp.asarray(src), jnp.ones(64, bool),
            jnp.asarray(tgt), jnp.ones(64, bool),
            jnp.asarray(np.eye(4, dtype=np.float32)), jnp.float32(0.05),
            jax.random.PRNGKey(0), 32,
        )
        assert not np.asarray(v).any()


class TestTrainSteps:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_cfg()
        params = init_params(cfg, jax.random.PRNGKey(0))
        rs = np.random.RandomState(0)
        src, tgt, T = synthetic_pair_full_overlap(rs, num_points=2000)
        batch = build_training_batch(cfg, src, tgt, T, rs, jax.random.PRNGKey(1))
        return cfg, params, batch

    def test_desc_step_runs_and_learns(self, setup):
        cfg, params, batch = setup
        opt = make_optimizer(cfg, "Desc", steps_per_epoch=10)
        step = make_train_step(cfg, "Desc", opt)
        variables = params["desc"]
        opt_state = opt.init(variables["params"])
        losses = []
        for i in range(8):
            variables, opt_state, m = step(
                variables, opt_state, batch, jax.random.PRNGKey(i)
            )
            assert bool(m["grads_finite"])
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        # same batch: loss must drop (8 steps — global-norm clipping
        # shrinks early steps, so 3 was within float jitter of flat)
        assert min(losses[1:]) < losses[0]

    def test_pose_step_runs(self, setup):
        cfg, params, batch = setup
        opt = make_optimizer(cfg, "Pose", steps_per_epoch=10)
        step = make_train_step(cfg, "Pose", opt)
        variables = params["pose"]
        opt_state = opt.init(variables["params"])
        losses = []
        for i in range(2):
            variables, opt_state, m = step(
                variables, opt_state, params["desc"], batch, jax.random.PRNGKey(i)
            )
            assert bool(m["grads_finite"])
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()

    def test_checkpoint_roundtrip(self, setup, tmp_path):
        cfg, params, _ = setup
        p1 = save_params(str(tmp_path / "Desc" / "best.msgpack"), params["desc"])
        p2 = save_params(str(tmp_path / "Pose" / "best.msgpack"), params["pose"])
        restored = compose_staged_params(p1, p2, params)
        diff = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            params, restored,
        )
        assert max(jax.tree.leaves(diff)) == 0.0


class TestRotationAugment:
    """data/training.py:rotate_pair — cloud-level rotation augmentation."""

    def _check_conjugation(self, mode, rng):
        from bufferx_tpu.data.training import rotate_pair

        rs = np.random.RandomState(3)
        src = rng.randn(200, 3).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(rotation_z(jnp.asarray(0.7)))
        T[:3, 3] = [0.2, -0.1, 0.3]
        tgt = src @ T[:3, :3].T + T[:3, 3]
        s2, t2, T2 = rotate_pair(src, tgt, T, rs, mode)
        # the conjugated pose must map the rotated src onto the rotated tgt
        err = np.abs(s2 @ T2[:3, :3].T + T2[:3, 3] - t2).max()
        assert err < 1e-4
        # and the clouds must actually have moved (augmentation happened)
        assert np.abs(s2 - src).max() > 1e-3
        # rotation part stays orthonormal
        R = T2[:3, :3]
        assert np.abs(R @ R.T - np.eye(3)).max() < 1e-5

    def test_so3_conjugation(self, rng):
        self._check_conjugation("so3", rng)

    def test_so2_conjugation(self, rng):
        self._check_conjugation("so2", rng)

    def test_so2_preserves_z(self, rng):
        from bufferx_tpu.data.training import rotate_pair

        rs = np.random.RandomState(4)
        src = rng.randn(50, 3).astype(np.float32)
        tgt = src.copy()
        _, _, T2 = rotate_pair(src, tgt, np.eye(4, dtype=np.float32), rs, "so2")
        # so2 mode: the conjugated rotation is still a rotation about +z
        assert np.abs(T2[2, :3] - [0, 0, 1]).max() < 1e-6
        assert np.abs(T2[:3, 2] - [0, 0, 1]).max() < 1e-6

    def test_none_identity(self, rng):
        from bufferx_tpu.data.training import rotate_pair

        rs = np.random.RandomState(5)
        src = rng.randn(50, 3).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        s2, t2, T2 = rotate_pair(src, src.copy(), T, rs, "none")
        assert np.array_equal(s2, src) and np.array_equal(T2, T)

    def test_batch_correspondences_survive_augmentation(self):
        # end-to-end: build_training_batch (rotation_augment defaults to
        # so3 for the indoor profile) still yields valid GT matches whose
        # warp error is below the voxel size
        cfg = tiny_cfg()
        assert cfg.train.rotation_augment == "so3"
        rs = np.random.RandomState(0)
        src, tgt, T = synthetic_pair_full_overlap(rs, num_points=2000)
        batch = build_training_batch(cfg, src, tgt, T, rs, jax.random.PRNGKey(2))
        v = np.asarray(batch["corr_valid"])
        assert v.sum() >= 8
        gt = np.asarray(batch["gt_pose"])
        sk = np.asarray(batch["src_kpt"])[v]
        tk = np.asarray(batch["tgt_kpt"])[v]
        err = np.linalg.norm(sk @ gt[:3, :3].T + gt[:3, 3] - tk, axis=-1)
        assert err.max() < cfg.data.voxel_size_0 + 1e-6


class TestSymmetricNegatives:
    def test_column_direction_adds_penalty(self, rng):
        # descriptor set where the hardest negative exists only in the
        # column direction: anchors far apart, one positive duplicated
        anc = np.eye(6, 8, dtype=np.float32) * 2.0
        pos = np.eye(6, 8, dtype=np.float32) * 2.0
        anc[3] = pos[0] + 0.01  # anchor 3 sits on top of positive 0
        kd = np.full((6, 6), 10.0, np.float32)
        valid = np.ones(6, bool)
        row_only, _ = contrastive_loss(
            jnp.asarray(anc), jnp.asarray(pos), jnp.asarray(kd),
            jnp.asarray(valid),
        )
        sym, _ = contrastive_loss(
            jnp.asarray(anc), jnp.asarray(pos), jnp.asarray(kd),
            jnp.asarray(valid), dist_keypts_src=jnp.asarray(kd),
        )
        # symmetric mining sees the extra hard negative -> larger loss
        assert float(sym) > float(row_only)

    def test_safe_radius_masks_source_side(self, rng):
        anc = rng.randn(6, 8).astype(np.float32)
        pos = anc + 0.01
        far = np.full((6, 6), 10.0, np.float32)
        near = np.full((6, 6), 0.0, np.float32)  # all spatially near
        l_far, _ = contrastive_loss(
            jnp.asarray(anc), jnp.asarray(pos), jnp.asarray(far),
            jnp.ones(6, bool), dist_keypts_src=jnp.asarray(far),
        )
        l_near, _ = contrastive_loss(
            jnp.asarray(anc), jnp.asarray(pos), jnp.asarray(far),
            jnp.ones(6, bool), dist_keypts_src=jnp.asarray(near),
        )
        # near source keypoints are excluded as column negatives -> the
        # column hinge saturates at neg_margin (no negatives available)
        assert float(l_near) >= float(l_far)


class TestStream:
    def test_synthetic_stream_shapes(self):
        cfg = tiny_cfg()
        batches = list(synthetic_training_stream(cfg, 2, num_points=1500))
        assert len(batches) == 2
        b = batches[0]
        assert b["src_fds"].shape == (1024, 3)
        assert b["src_kpt"].shape == (32, 3)
        assert b["corr_valid"].sum() > 0


class TestResume:
    def test_train_state_roundtrip(self, tmp_path):
        cfg = tiny_cfg()
        params = init_params(cfg, jax.random.PRNGKey(0))
        opt = make_optimizer(cfg, "Desc", 10)
        opt_state = opt.init(params["desc"]["params"])
        from bufferx_tpu.train.trainer import (
            restore_train_state,
            save_train_state,
        )

        p = save_train_state(
            str(tmp_path / "state.msgpack"), params["desc"], opt_state, 3, 0.5
        )
        variables, opt2, epoch, best = restore_train_state(
            p, params["desc"], opt_state
        )
        assert epoch == 3 and best == 0.5
        diff = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            params["desc"], variables,
        )
        assert max(jax.tree.leaves(diff)) == 0.0


class TestExtraLosses:
    def test_sos_variant(self, rng):
        from bufferx_tpu.train.losses import contrastive_loss_with_sos

        a = rng.randn(8, 16).astype(np.float32)
        kd = np.full((8, 8), 10.0, np.float32)
        # identical sets: SOS term vanishes, equals plain contrastive
        loss_same, _ = contrastive_loss_with_sos(
            jnp.asarray(a), jnp.asarray(a), jnp.asarray(kd), jnp.ones(8, bool)
        )
        loss_diff, _ = contrastive_loss_with_sos(
            jnp.asarray(a), jnp.asarray(rng.randn(8, 16).astype(np.float32)),
            jnp.asarray(kd), jnp.ones(8, bool),
        )
        assert float(loss_diff) > float(loss_same)

    def test_hardest_contrastive(self, rng):
        from bufferx_tpu.train.losses import hardest_contrastive_loss

        a = np.eye(8, 16, dtype=np.float32) * 2
        loss = hardest_contrastive_loss(
            jnp.asarray(a), jnp.asarray(a), jnp.ones(8, bool)
        )
        assert np.isfinite(float(loss))

    def test_classification_loss_balanced(self):
        from bufferx_tpu.train.losses import inlier_classification_loss

        logits = jnp.asarray([10.0, 10.0, -10.0, 10.0])
        labels = jnp.asarray([1, 1, 0, 0])
        valid = jnp.ones(4, bool)
        # one wrong confident positive prediction on a negative
        loss = inlier_classification_loss(logits, labels, valid)
        assert float(loss) > 1.0

    def test_transformation_loss_zero_at_gt(self, rng):
        from bufferx_tpu.train.losses import transformation_loss

        T = np.eye(4, dtype=np.float32)
        assert float(transformation_loss(jnp.asarray(T), jnp.asarray(T))) == 0.0
        assert (
            float(
                transformation_loss(
                    jnp.asarray(T), jnp.asarray(T), loss_type="geodesic"
                )
            )
            == 0.0
        )


class TestUNetBackbone:
    def test_shapes(self, rng):
        from bufferx_tpu.models.layers import CylindricalUNet

        model = CylindricalUNet(dim=32)
        x = jnp.asarray(rng.randn(2, 3, 7, 20, 16).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out, mid = model.apply(variables, x, train=False)
        assert out.shape == (2, 7, 20, 32)
        assert mid is None


class TestTrainerLoop:
    def test_trainer_epochs_scalars_resume(self, tmp_path):
        """Trainer host loop: scalars.jsonl sink + elastic resume."""
        import json
        from bufferx_tpu.train.trainer import Trainer

        cfg = tiny_cfg()
        params = init_params(cfg, jax.random.PRNGKey(0))
        rs = np.random.RandomState(0)
        src, tgt, T = synthetic_pair_full_overlap(rs, num_points=1500)
        batch = build_training_batch(cfg, src, tgt, T, rs,
                                     jax.random.PRNGKey(1))

        def batches():
            return [batch, batch]

        snap = str(tmp_path / "run")
        tr = Trainer(cfg, "Desc", params["desc"], None, batches,
                     steps_per_epoch=2, snapshot_dir=snap, log=lambda *a: None)
        tr.train(epochs=2)

        scalars = [
            json.loads(line)
            for line in open(os.path.join(snap, "Desc", "scalars.jsonl"))
        ]
        assert [s["epoch"] for s in scalars] == [0, 1]
        assert all("desc_loss" in s and "val_desc_loss" in s for s in scalars)
        assert os.path.exists(os.path.join(snap, "Desc", "best.msgpack"))

        # resume: a fresh Trainer picks up from epoch 2
        tr2 = Trainer(cfg, "Desc", params["desc"], None, batches,
                      steps_per_epoch=2, snapshot_dir=snap,
                      log=lambda *a: None)
        assert tr2.resume()
        assert tr2.start_epoch == 2


class TestNaNRecovery:
    def test_guarded_update_survives_nan_grads(self):
        """One NaN gradient must not poison params OR the optimizer state:
        the next finite-grad step must produce a finite, APPLIED update
        (regression: grads-only guarding let Adam's poisoned m/v write
        NaN params one step later)."""
        import optax
        from bufferx_tpu.train.trainer import _guarded_update

        opt = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
        params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
        state = opt.init(params)

        good = {"w": jnp.full((4,), 0.1), "b": jnp.full((2,), -0.2)}
        bad = {"w": jnp.asarray([jnp.nan, 1.0, 1.0, 1.0]),
               "b": jnp.full((2,), jnp.inf)}

        p1, s1, ok1 = _guarded_update(opt, good, state, params)
        assert bool(ok1)
        assert not np.allclose(np.asarray(p1["w"]), 1.0)  # applied

        p2, s2, ok2 = _guarded_update(opt, bad, s1, p1)
        assert not bool(ok2)
        for leaf in jax.tree.leaves((p2, s2)):
            arr = np.asarray(leaf)
            if np.issubdtype(arr.dtype, np.floating):
                assert np.isfinite(arr).all()

        # the step AFTER the poison must be finite AND move the params
        p3, s3, ok3 = _guarded_update(opt, good, s2, p2)
        assert bool(ok3)
        for leaf in jax.tree.leaves(p3):
            assert np.isfinite(np.asarray(leaf)).all()
        assert float(np.abs(np.asarray(p3["w"]) -
                            np.asarray(p2["w"])).max()) > 0.0

    def test_pipeline_absorbs_poison_batches(self):
        """Degenerate batches (inf points, zero radius) must yield FINITE
        losses — the masked geometry absorbs them (inf coords fail every
        radius test; empty patches produce zero features)."""
        from bufferx_tpu.train.trainer import make_optimizer, make_train_step

        cfg = tiny_cfg()
        params = init_params(cfg, jax.random.PRNGKey(0))
        rs = np.random.RandomState(0)
        src, tgt, T = synthetic_pair_full_overlap(rs, num_points=1500)
        clean = build_training_batch(cfg, src, tgt, T, rs,
                                     jax.random.PRNGKey(1))
        opt = make_optimizer(cfg, "Desc", steps_per_epoch=10)
        step = make_train_step(cfg, "Desc", opt)
        variables = params["desc"]
        opt_state = opt.init(variables["params"])

        for poison_fn in (
            lambda b: {**b, "des_r": jnp.float32(0.0)},
            lambda b: {**b, "src_fds": jnp.asarray(
                np.where(np.arange(b["src_fds"].shape[0])[:, None] == 10,
                         np.inf, np.asarray(b["src_fds"])))},
        ):
            _, _, m = step(variables, opt_state, poison_fn(clean),
                           jax.random.PRNGKey(3))
            assert np.isfinite(float(m["loss"]))


class TestCollapseGuard:
    """Round-3 postmortem regression: the contrastive saddle
    (desc_loss == neg_margin - pos_margin, desc_acc at floor) must trigger
    a rollback to the last healthy state instead of destroying the run."""

    def _mk(self, **kw):
        from bufferx_tpu.train.guard import CollapseGuard

        return CollapseGuard(**kw)

    def test_healthy_run_never_triggers(self):
        g = self._mk(patience=3)
        v = {"params": jnp.ones(3)}
        for step in range(20):
            assert not g.update(
                step, {"desc_loss": 0.8 - 0.01 * step, "desc_acc": 0.3,
                       "grads_finite": 1.0}, v
            )
        assert g.last_good_step == 19

    def test_saddle_triggers_and_restores_last_good(self):
        g = self._mk(patience=3)
        healthy = {"params": jnp.full(3, 7.0)}
        bad = {"params": jnp.full(3, jnp.nan)}
        for step in range(5):
            assert not g.update(
                step, {"desc_loss": 0.9, "desc_acc": 0.4}, healthy
            )
        # collapse: loss pinned at the saddle (1.4 - 0.1), acc at floor
        fired = False
        for step in range(5, 12):
            if g.update(step, {"desc_loss": 1.301, "desc_acc": 0.02}, bad):
                fired = True
                break
        assert fired and g.last_good_step == 4
        restored = g.restore(fallback=bad)
        assert bool(jnp.all(restored["params"] == 7.0))

    def test_instant_collapse_restores_fallback(self):
        g = self._mk(patience=2)
        bad = {"params": jnp.zeros(2)}
        init = {"params": jnp.full(2, 5.0)}
        assert not g.update(0, {"desc_loss": 1.30, "desc_acc": 0.0}, bad)
        assert g.update(1, {"desc_loss": 1.30, "desc_acc": 0.0}, bad)
        restored = g.restore(fallback=init)
        assert bool(jnp.all(restored["params"] == 5.0))

    def test_acc_crash_after_health_triggers(self):
        g = self._mk(patience=2)
        v = {"p": jnp.ones(1)}
        # slow start below the floor does NOT trigger (no prior health)
        for step in range(6):
            assert not g.update(
                step, {"desc_loss": 2.5, "desc_acc": 0.01}, v
            )
        # now healthy, then crash (loss NOT at the saddle value)
        assert not g.update(6, {"desc_loss": 0.7, "desc_acc": 0.5}, v)
        assert not g.update(7, {"desc_loss": 2.0, "desc_acc": 0.01}, v)
        assert g.update(8, {"desc_loss": 2.0, "desc_acc": 0.01}, v)

    def test_nonfinite_grads_streak_triggers(self):
        g = self._mk(patience=2)
        v = {"p": jnp.ones(1)}
        assert not g.update(0, {"grads_finite": 0.0}, v)
        assert g.update(1, {"grads_finite": 0.0}, v)

    def test_crash_detection_can_be_disabled_for_curricula(self):
        """A curriculum phase transition (healthy then sub-floor acc with
        loss NOT at the saddle) must not trigger when detect_crash=False;
        the saddle signature still must."""
        g = self._mk(patience=2, detect_crash=False)
        v = {"p": jnp.ones(1)}
        assert not g.update(0, {"desc_loss": 0.7, "desc_acc": 0.5}, v)
        # hard-phase dip: low acc, loss far from the saddle -> no trigger
        for step in range(1, 8):
            assert not g.update(
                step, {"desc_loss": 2.1, "desc_acc": 0.01}, v
            )
        # the saddle signature still fires
        assert not g.update(8, {"desc_loss": 1.30, "desc_acc": 0.01}, v)
        assert g.update(9, {"desc_loss": 1.30, "desc_acc": 0.01}, v)


class TestBestMetaPersistence:
    """A second Trainer run must not overwrite a better best.msgpack."""

    def test_best_loss_survives_reconstruction(self, tmp_path):
        import json
        import os

        from bufferx_tpu.train.trainer import Trainer

        cfg = make_cfg("ModelNet40").override(
            capacity=dict(max_points=1024, sphere_query_chunk=32),
            patch=dict(num_points_per_patch=64),
        )
        params = init_params(cfg, jax.random.PRNGKey(0))
        snap = str(tmp_path / "snap")

        t1 = Trainer(cfg, "Desc", params["desc"], None, lambda: [],
                     snapshot_dir=snap, log=lambda *a: None)
        assert t1.best_loss == float("inf")
        # simulate a completed run that saved a best checkpoint
        from bufferx_tpu.train.trainer import save_params

        save_params(os.path.join(snap, "Desc", "best.msgpack"), t1.variables)
        t1.best_loss = 0.42
        t1._write_best_meta()

        t2 = Trainer(cfg, "Desc", params["desc"], None, lambda: [],
                     snapshot_dir=snap, log=lambda *a: None)
        assert t2.best_loss == 0.42

        # meta without checkpoint -> starts fresh
        os.remove(os.path.join(snap, "Desc", "best.msgpack"))
        t3 = Trainer(cfg, "Desc", params["desc"], None, lambda: [],
                     snapshot_dir=snap, log=lambda *a: None)
        assert t3.best_loss == float("inf")
