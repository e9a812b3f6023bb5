"""Multi-frame SLAM front-end integration test on a synthetic trajectory."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bufferx_tpu.config import make_cfg
from bufferx_tpu.core import se3
from bufferx_tpu.data.modelnet import synthetic_object
from bufferx_tpu.pipeline.multiframe import build_pose_graph, register_sequence
from bufferx_tpu.pipeline.registration import init_params


def small_cfg():
    return make_cfg("ModelNet40").override(
        capacity=dict(
            max_points=2048, num_ransac_hypotheses=1024, ransac_chunk=256,
            sphere_query_chunk=64,
        ),
        patch=dict(
            num_fps=256, num_points_radius_estimate=256,
            num_points_per_patch=128, num_scales=1,
            search_radius_thresholds=(5.0,),
        ),
    )


def load_trained(cfg):
    """In-repo synthetic checkpoint (falls back to untrained init)."""
    import os

    from bufferx_tpu.train.trainer import compose_staged_params

    params = init_params(cfg, jax.random.PRNGKey(0))
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "snapshot", "synthetic",
    )
    if os.path.isdir(root):
        params = compose_staged_params(
            os.path.join(root, "Desc", "best.msgpack"),
            os.path.join(root, "Pose", "best.msgpack"),
            params,
        )
    return params


def make_trajectory(rs, k=4):
    """World scene observed from k poses: frame i sees T_i^{-1} applied to
    the world cloud (sensor-frame points), with GT world-from-frame T_i."""
    world = synthetic_object(rs, 3000) * 2.0
    poses = [np.eye(4, dtype=np.float32)]
    for _ in range(k - 1):
        d = np.eye(4, dtype=np.float32)
        ang = rs.uniform(-0.3, 0.3)
        c, s = np.cos(ang), np.sin(ang)
        d[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        d[:3, 3] = rs.uniform(-0.4, 0.4, 3)
        poses.append(poses[-1] @ d)
    clouds = []
    for T in poses:
        Ti = np.linalg.inv(T)
        local = world @ Ti[:3, :3].T + Ti[:3, 3]
        clouds.append(
            (local + rs.randn(*local.shape) * 0.002).astype(np.float32)
        )
    return clouds, np.stack(poses)


class TestBuildPoseGraph:
    def test_weights_and_measurements(self):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [1, 0, 0]
        g = build_pose_graph(
            [(0, 1), (1, 2)], [T, T], [100, 2], min_inliers=5
        )
        assert float(g.weights[0]) == pytest.approx(10.0)
        assert float(g.weights[1]) == 0.0  # below min_inliers
        # factor measurement is inv(T): T_j ≈ T_i @ inv(T_ij)
        np.testing.assert_allclose(
            np.asarray(g.t_meas[0]), np.linalg.inv(T), atol=1e-6
        )


class TestRegisterSequence:
    def test_trajectory_recovery(self):
        cfg = small_cfg()
        params = load_trained(cfg)
        rs = np.random.RandomState(0)
        clouds, gt_poses = make_trajectory(rs, k=4)
        out = register_sequence(
            cfg, clouds, params, jax.random.PRNGKey(0),
            loop_closures=[(0, 3)],
        )
        assert out.poses.shape == (4, 4, 4)
        # frame 0 anchored at identity
        np.testing.assert_allclose(
            np.asarray(out.poses[0]), np.eye(4), atol=1e-3
        )
        for i in range(4):
            rte = float(se3.compute_rte(out.poses[i], jnp.asarray(gt_poses[i])))
            rre = float(se3.compute_rre(out.poses[i], jnp.asarray(gt_poses[i])))
            assert rte < 0.15 and rre < 10.0, (i, rte, rre)

    def test_mesh_sharded_path_runs(self):
        cfg = small_cfg()
        params = load_trained(cfg)
        rs = np.random.RandomState(1)
        clouds, gt_poses = make_trajectory(rs, k=3)
        out = register_sequence(
            cfg, clouds, params, jax.random.PRNGKey(0), use_mesh=True
        )
        assert np.isfinite(np.asarray(out.poses)).all()
        rte = float(se3.compute_rte(out.poses[1], jnp.asarray(gt_poses[1])))
        assert rte < 0.2
