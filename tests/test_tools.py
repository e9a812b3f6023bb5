"""Offline-tool tests: TSDF fusion, pair synthesis, scan decomposition."""

import numpy as np

from bufferx_tpu.config import make_cfg
from bufferx_tpu.data.datasets import ModelNet40Dataset
from bufferx_tpu.tools.pairgen import decompose_to_scans, process_modelnet40
from bufferx_tpu.tools.tsdf import (
    extract_points,
    integrate_frame,
    make_volume,
)


class TestTSDF:
    def test_flat_wall_reconstruction(self):
        # camera at origin looking +z at a wall at z=1: fused surface voxels
        # concentrate near z=1
        h, w = 64, 64
        fx = fy = 64.0
        cam_k = np.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]], np.float32)
        depth = np.full((h, w), 1.0, np.float32)
        vol = make_volume(origin=[-0.6, -0.6, 0.4], dims=(48, 48, 32),
                         voxel_size=0.025)
        vol = integrate_frame(vol, cam_k, np.eye(4, dtype=np.float32), depth)
        pts = extract_points(vol, band=0.2)
        assert len(pts) > 50
        assert abs(np.median(pts[:, 2]) - 1.0) < 0.05

    def test_two_views_merge(self):
        h, w = 48, 48
        cam_k = np.array([[48.0, 0, 24], [0, 48.0, 24], [0, 0, 1]], np.float32)
        depth = np.full((h, w), 1.0, np.float32)
        vol = make_volume([-0.8, -0.8, 0.3], (64, 64, 40), 0.025)
        # second camera shifted +x, same wall
        c2 = np.eye(4, dtype=np.float32)
        c2[0, 3] = 0.3
        vol = integrate_frame(vol, cam_k, np.eye(4, dtype=np.float32), depth)
        vol = integrate_frame(vol, cam_k, c2, depth)
        pts = extract_points(vol, band=0.2)
        # coverage extends further in +x than a single view
        assert pts[:, 0].max() > 0.5
        # weights accumulate where views overlap
        assert float(np.asarray(vol.weight).max()) >= 2.0

    def test_invalid_depth_ignored(self):
        h, w = 32, 32
        cam_k = np.array([[32.0, 0, 16], [0, 32.0, 16], [0, 0, 1]], np.float32)
        depth = np.zeros((h, w), np.float32)  # all invalid
        vol = make_volume([-0.5, -0.5, 0.5], (16, 16, 16), 0.05)
        vol2 = integrate_frame(vol, cam_k, np.eye(4, dtype=np.float32), depth)
        assert float(np.abs(np.asarray(vol2.weight)).max()) == 0.0


class TestPairGen:
    def test_modelnet_dataset_roundtrip(self, tmp_path):
        out = process_modelnet40(
            str(tmp_path / "mn40"), num_objects=2, pairs_per_object=1,
            num_points=2000,
        )
        cfg = make_cfg("ModelNet40", out)
        ds = ModelNet40Dataset(cfg)
        assert len(ds) == 2
        s = ds[0]
        assert s["src_points"].shape[1] == 3
        # GT sanity: warped src overlaps tgt
        src, tgt, T = s["src_points"], s["tgt_points"], s["relt_pose"]
        warped = src @ T[:3, :3].T + T[:3, 3]
        from scipy.spatial import cKDTree

        d, _ = cKDTree(tgt).query(warped)
        assert np.median(d) < 0.05

    def test_decompose_partial_views(self, rng):
        from bufferx_tpu.data.modelnet import synthetic_object

        cloud = synthetic_object(np.random.RandomState(0), 5000) * 3
        scans, positions = decompose_to_scans(cloud, num_scans=3, seed=1)
        assert len(scans) == 3
        for s in scans:
            assert 0 < len(s) < len(cloud)  # partial views
        # different viewpoints see different subsets
        assert abs(len(scans[0]) - len(scans[1])) >= 0 and len(scans[0]) != len(cloud)
