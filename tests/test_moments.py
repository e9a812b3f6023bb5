"""Tests for the dense moment-pooling descriptor mode.

- numpy brute-force oracle for the raw cell moments,
- derotation/normalization properties of ``moments_to_features`` (SO(2)
  equivariance: rotating the patch about +z by one azimuth bin cyclically
  shifts the feature grid),
- Pallas kernel parity (interpret mode, bf16 tolerance),
- model + pipeline integration in ``desc_mode="moments"``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bufferx_tpu.geometry.cylindrical import grid_cell_centers
from bufferx_tpu.geometry.moments import (
    NUM_MOMENTS,
    moments_to_features,
    pool_cell_moments,
)
from bufferx_tpu.geometry.spt_pallas import spt_moments_pallas

RAD, ELE, AZI, DELTA = 3, 7, 20, 0.8


def numpy_moments(patches, mask, cells, radius):
    K, P, _ = patches.shape
    G = cells.shape[0]
    out = np.zeros((K, G, NUM_MOMENTS), np.float64)
    for k in range(K):
        for g in range(G):
            d2 = np.sum((patches[k] - cells[g]) ** 2, axis=-1)
            sel = (d2 <= radius * radius) & mask[k]
            pts = patches[k][sel]
            if len(pts) == 0:
                continue
            x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
            out[k, g] = [
                x.sum(), y.sum(), z.sum(),
                (x * x).sum(), (y * y).sum(), (z * z).sum(),
                (x * y).sum(), (y * z).sum(), (z * x).sum(),
                len(pts),
            ]
    return out


class TestPoolCellMoments:
    def test_matches_numpy_oracle(self, rng):
        K, P = 3, 96
        patches = (rng.randn(K, P, 3) * 0.4).astype(np.float32)
        mask = np.ones((K, P), bool)
        mask[:, 80:] = False
        cells = grid_cell_centers(RAD, ELE, AZI)
        ref = numpy_moments(patches, mask, cells, DELTA / RAD)
        out = pool_cell_moments(
            jnp.asarray(patches), jnp.asarray(mask),
            rad_n=RAD, ele_n=ELE, azi_n=AZI, delta=DELTA,
        )
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)

    def test_invalid_points_contribute_nothing(self, rng):
        # invalid slots sit at the origin (keypoint) — inside central cells'
        # query balls — and must still contribute exact zeros.
        K, P = 1, 64
        patches = np.zeros((K, P, 3), np.float32)
        mask = np.zeros((K, P), bool)
        out = pool_cell_moments(
            jnp.asarray(patches), jnp.asarray(mask),
            rad_n=RAD, ele_n=ELE, azi_n=AZI, delta=DELTA,
        )
        assert np.all(np.asarray(out) == 0.0)

    def test_pallas_parity_interpret(self, rng):
        K, P = 5, 192
        patches = (rng.randn(K, P, 3) * 0.4).astype(np.float32)
        mask = np.ones((K, P), bool)
        mask[:, 160:] = False
        cells = jnp.asarray(grid_cell_centers(RAD, ELE, AZI))
        ref = pool_cell_moments(
            jnp.asarray(patches), jnp.asarray(mask),
            rad_n=RAD, ele_n=ELE, azi_n=AZI, delta=DELTA,
        )
        out = spt_moments_pallas(
            jnp.asarray(patches), jnp.asarray(mask), cells, DELTA / RAD,
            interpret=True,
        )
        # psi is bf16 in the kernel: coordinate moments carry ~0.4% rounding
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-3
        )
        # counts are exact (0/1 values, f32 accumulation)
        np.testing.assert_array_equal(
            np.asarray(out)[..., 9], np.asarray(ref)[..., 9]
        )


class TestMomentsToFeatures:
    def test_empty_cells_zero(self):
        raw = jnp.zeros((2, RAD * ELE * AZI, NUM_MOMENTS))
        f = moments_to_features(raw, rad_n=RAD, ele_n=ELE, azi_n=AZI,
                                delta=DELTA)
        assert f.shape == (2, RAD * ELE * AZI, NUM_MOMENTS)
        assert np.all(np.asarray(f) == 0.0)

    def test_so2_equivariance_cyclic_shift(self, rng):
        # rotating the patch about +z by one azimuth bin must cyclically
        # shift the normalized feature grid along the azimuth axis.
        K, P = 2, 256
        patches = (rng.randn(K, P, 3) * 0.4).astype(np.float32)
        mask = np.ones((K, P), bool)
        th = 2.0 * np.pi / AZI
        R = np.asarray(
            [[np.cos(th), -np.sin(th), 0.0],
             [np.sin(th), np.cos(th), 0.0],
             [0.0, 0.0, 1.0]],
            np.float32,
        )
        rotated = patches @ R.T

        def feats(p):
            raw = pool_cell_moments(
                jnp.asarray(p), jnp.asarray(mask),
                rad_n=RAD, ele_n=ELE, azi_n=AZI, delta=DELTA,
            )
            f = moments_to_features(raw, rad_n=RAD, ele_n=ELE, azi_n=AZI,
                                    delta=DELTA)
            return np.asarray(f).reshape(K, RAD, ELE, AZI, NUM_MOMENTS)

        f0 = feats(patches)
        f1 = feats(rotated)
        np.testing.assert_allclose(
            f1, np.roll(f0, shift=1, axis=3), rtol=1e-3, atol=1e-4
        )

    def test_single_point_cell_features(self):
        # one point exactly at a cell center: offset 0, cov 0, count 1
        cells = grid_cell_centers(RAD, ELE, AZI)
        g = 7
        patches = np.full((1, 8, 3), 100.0, np.float32)
        patches[0, 0] = cells[g]
        mask = np.ones((1, 8), bool)
        raw = pool_cell_moments(
            jnp.asarray(patches), jnp.asarray(mask),
            rad_n=RAD, ele_n=ELE, azi_n=AZI, delta=DELTA,
        )
        f = np.asarray(
            moments_to_features(raw, rad_n=RAD, ele_n=ELE, azi_n=AZI,
                                delta=DELTA)
        )
        assert abs(f[0, g, 0] - np.log1p(1.0) * 0.25) < 1e-5   # density
        np.testing.assert_allclose(f[0, g, 1:4], 0.0, atol=1e-5)  # offset
        np.testing.assert_allclose(f[0, g, 4:], 0.0, atol=1e-5)   # cov


class TestMomentsModeIntegration:
    def test_model_forward_shapes(self, rng):
        from bufferx_tpu.models.spinnet import MiniSpinNet

        m = MiniSpinNet(rad_n=RAD, ele_n=ELE, azi_n=AZI, mode="moments")
        # moments-major input [K, 10, G]
        x = jnp.asarray(rng.randn(4, 10, RAD * ELE * AZI).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(params, x, train=False)
        assert out["desc"].shape == (4, 32)
        assert out["equi"].shape == (4, 32, ELE, AZI)

    def test_register_pair_smoke(self, rng):
        from bufferx_tpu.config import make_cfg
        from bufferx_tpu.core import se3
        from bufferx_tpu.data.modelnet import synthetic_pair
        from bufferx_tpu.pipeline.registration import (
            prepare_cloud,
            register_pair,
        )

        cfg = make_cfg("ModelNet40").override(
            patch=dict(desc_mode="moments", num_fps=96,
                       num_points_radius_estimate=128,
                       num_points_per_patch=64, num_scales=2),
            capacity=dict(max_points=2048, num_ransac_hypotheses=256,
                          ransac_chunk=256, sphere_query_chunk=64),
        )
        src, tgt, T_gt = synthetic_pair(np.random.RandomState(0),
                                        num_points=1500)
        out = register_pair(
            cfg, prepare_cloud(src, cfg), prepare_cloud(tgt, cfg),
            jax.random.PRNGKey(0),
        )
        assert out.pose.shape == (4, 4)
        assert bool(out.valid)
        # untrained net: no recall guarantee, but the pose must be a valid
        # rigid transform
        R = np.asarray(out.pose)[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
        assert float(se3.compute_rte(out.pose, jnp.asarray(T_gt))) < 10.0

    def test_train_step_moments(self, rng):
        from bufferx_tpu.config import make_cfg
        from bufferx_tpu.models.spinnet import MiniSpinNet
        from bufferx_tpu.train.forward import TrainStatics, desc_stage_loss

        cfg = make_cfg("ModelNet40").override(
            patch=dict(desc_mode="moments", num_points_per_patch=64),
            train=dict(pos_num=16),
        )
        s = TrainStatics.from_config(cfg)
        assert s.desc_mode == "moments"
        model = MiniSpinNet(rad_n=s.rad_n, ele_n=s.ele_n, azi_n=s.azi_n,
                            mode="moments")
        g = s.rad_n * s.ele_n * s.azi_n
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 10, g)), train=False
        )
        n = 512
        cloud = rng.randn(n, 3).astype(np.float32)
        kpt = cloud[:16]
        batch = {
            "src_fds": jnp.asarray(cloud),
            "src_fds_mask": jnp.ones(n, bool),
            "tgt_fds": jnp.asarray(cloud),
            "tgt_fds_mask": jnp.ones(n, bool),
            "src_kpt": jnp.asarray(kpt),
            "tgt_kpt": jnp.asarray(kpt),
            "corr_valid": jnp.ones(16, bool),
            "gt_pose": jnp.eye(4),
            "des_r": jnp.asarray(0.5),
            "is_aligned": jnp.asarray(False),
        }
        loss, aux = desc_stage_loss(
            params, model, s, batch, jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(loss))
        grads = jax.grad(
            lambda p: desc_stage_loss(p, model, s, batch,
                                      jax.random.PRNGKey(1))[0]
        )(params)
        flat = jax.tree.leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)

    def test_statics_roundtrip(self):
        from bufferx_tpu.config import make_cfg
        from bufferx_tpu.pipeline.registration import (
            PipelineStatics,
            init_params,
        )

        cfg = make_cfg("ModelNet40").override(
            patch=dict(desc_mode="moments")
        )
        s = PipelineStatics.from_config(cfg)
        assert s.desc_mode == "moments"
        assert dataclasses.asdict(s)["desc_mode"] == "moments"
        params = init_params(cfg, jax.random.PRNGKey(0))
        # moments-mode point layer consumes 10 moment channels
        k0 = [k for k in params["desc"]["params"] if k.startswith("ConvBNRelu")]
        assert len(k0) > 0


def test_derotation_matches_einsum_reference():
    """The explicit-trig derotation in moments_to_features must equal the
    einsum/rotation-matrix form it replaced (round-4 perf rewrite: the
    einsum lowered to millions of 3x3 dot_generals, ~10x slower)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bufferx_tpu.core.se3 import rotation_z
    from bufferx_tpu.geometry.moments import (
        NUM_MOMENTS,
        moments_to_features,
    )

    rad_n, ele_n, azi_n, delta = 3, 5, 8, 0.8
    g = rad_n * ele_n * azi_n
    rs = np.random.RandomState(11)
    raw = np.zeros((7, g, NUM_MOMENTS), np.float32)
    # build raw moments from synthetic point sets so n/s1/s2 are consistent
    counts = rs.randint(0, 5, size=(7, g))
    for k in range(7):
        for c in range(g):
            pts = rs.randn(counts[k, c], 3).astype(np.float32) * 0.1
            x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
            raw[k, c] = [x.sum(), y.sum(), z.sum(),
                         (x * x).sum(), (y * y).sum(), (z * z).sum(),
                         (x * y).sum(), (y * z).sum(), (z * x).sum(),
                         len(pts)]

    got = np.asarray(
        moments_to_features(jnp.asarray(raw), rad_n=rad_n, ele_n=ele_n,
                            azi_n=azi_n, delta=delta)
    )

    # einsum reference (the pre-rewrite formulation)
    def reference(raw):
        from bufferx_tpu.geometry.cylindrical import grid_cell_centers

        hp = jax.lax.Precision.HIGHEST
        k = raw.shape[0]
        raw = raw.reshape(k, rad_n, ele_n, azi_n, NUM_MOMENTS)
        s1 = raw[..., 0:3]
        n = raw[..., 9]
        sxx, syy, szz = raw[..., 3], raw[..., 4], raw[..., 5]
        sxy, syz, szx = raw[..., 6], raw[..., 7], raw[..., 8]
        m2 = jnp.stack(
            [jnp.stack([sxx, sxy, szx], axis=-1),
             jnp.stack([sxy, syy, syz], axis=-1),
             jnp.stack([szx, syz, szz], axis=-1)], axis=-2)
        angles = -2.0 * jnp.pi / azi_n * jnp.arange(azi_n, dtype=raw.dtype)
        R = rotation_z(angles)
        s1 = jnp.einsum("aij,kreaj->kreai", R, s1, precision=hp)
        m2 = jnp.einsum("aij,kreajl,aml->kreaim", R, m2, R, precision=hp)
        centers = jnp.asarray(grid_cell_centers(rad_n, ele_n, azi_n))
        centers = centers.reshape(rad_n, ele_n, azi_n, 3)
        canon = jnp.einsum("aij,reaj->reai", R, centers, precision=hp)
        cell_r = delta / rad_n
        n_safe = jnp.maximum(n, 1.0)
        mean = s1 / n_safe[..., None]
        cov = (m2 / n_safe[..., None, None]
               - mean[..., :, None] * mean[..., None, :])
        off = (mean - canon[None]) / cell_r
        cov = cov / (cell_r * cell_r)
        cov6 = jnp.stack(
            [cov[..., 0, 0], cov[..., 1, 1], cov[..., 2, 2],
             cov[..., 0, 1], cov[..., 1, 2], cov[..., 2, 0]], axis=-1)
        density = jnp.log1p(n)[..., None] * 0.25
        feats = jnp.concatenate([density, off, cov6], axis=-1)
        feats = jnp.where(n[..., None] > 0.0, feats, 0.0)
        return feats.reshape(k, g, NUM_MOMENTS)

    want = np.asarray(reference(jnp.asarray(raw)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_moments_major_matches_standard_layout():
    """moments_to_features_mm([K,10,G]) must equal
    moments_to_features([K,G,10]) transposed — the layouts are the only
    difference."""
    import jax.numpy as jnp
    import numpy as np

    from bufferx_tpu.geometry.moments import (
        NUM_MOMENTS,
        moments_to_features,
        moments_to_features_mm,
    )

    rad_n, ele_n, azi_n, delta = 3, 5, 8, 0.8
    g = rad_n * ele_n * azi_n
    rs = np.random.RandomState(4)
    raw = np.abs(rs.randn(6, g, NUM_MOMENTS)).astype(np.float32)
    raw[:, ::3, 9] = 0.0          # some empty cells
    want = np.asarray(
        moments_to_features(jnp.asarray(raw), rad_n=rad_n, ele_n=ele_n,
                            azi_n=azi_n, delta=delta)
    )
    got = np.asarray(
        moments_to_features_mm(
            jnp.asarray(np.transpose(raw, (0, 2, 1))),
            rad_n=rad_n, ele_n=ele_n, azi_n=azi_n, delta=delta,
        )
    )
    np.testing.assert_allclose(np.transpose(got, (0, 2, 1)), want,
                               rtol=2e-5, atol=2e-5)


def test_pool_cell_moments_moments_major_layout():
    import jax.numpy as jnp
    import numpy as np

    from bufferx_tpu.geometry.moments import pool_cell_moments

    rs = np.random.RandomState(5)
    pa = jnp.asarray(rs.randn(9, 64, 3).astype(np.float32) * 0.3)
    ma = jnp.asarray(rs.rand(9, 64) > 0.2)
    a = np.asarray(pool_cell_moments(pa, ma, rad_n=2, ele_n=3, azi_n=4,
                                     delta=0.8))
    b = np.asarray(pool_cell_moments(pa, ma, rad_n=2, ele_n=3, azi_n=4,
                                     delta=0.8, moments_major=True))
    np.testing.assert_allclose(np.transpose(b, (0, 2, 1)), a, rtol=1e-6)
