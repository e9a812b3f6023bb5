"""Data-layer tests: file readers, trajectory logs, pair walking, loaders
on synthetic on-disk fixtures."""

import os

import numpy as np
import pytest

from bufferx_tpu.config import make_cfg
from bufferx_tpu.data import io
from bufferx_tpu.data.base import (
    read_trajectory_info,
    read_trajectory_log,
    walk_odometry_pairs,
    write_trajectory_log,
)
from bufferx_tpu.data.datasets import ETHDataset, get_dataset, icp_refine


class TestIO:
    def test_ply_binary_roundtrip(self, tmp_path, rng):
        pts = rng.randn(100, 3).astype(np.float32)
        p = tmp_path / "a.ply"
        with open(p, "wb") as f:
            f.write(b"ply\nformat binary_little_endian 1.0\n")
            f.write(b"element vertex 100\n")
            f.write(b"property float x\nproperty float y\nproperty float z\n")
            f.write(b"end_header\n")
            f.write(pts.astype("<f4").tobytes())
        got = io.read_ply(str(p))
        np.testing.assert_allclose(got, pts, atol=1e-6)

    def test_ply_ascii_with_extra_props(self, tmp_path, rng):
        pts = rng.randn(5, 3)
        p = tmp_path / "a.ply"
        with open(p, "w") as f:
            f.write("ply\nformat ascii 1.0\nelement vertex 5\n")
            f.write("property float x\nproperty float y\nproperty float z\n")
            f.write("property uchar red\n")
            f.write("end_header\n")
            for row in pts:
                f.write(f"{row[0]} {row[1]} {row[2]} 255\n")
        got = io.read_ply(str(p))
        np.testing.assert_allclose(got, pts, atol=1e-5)

    def test_pcd_ascii(self, tmp_path, rng):
        pts = rng.randn(7, 3)
        p = tmp_path / "a.pcd"
        with open(p, "w") as f:
            f.write("# .PCD v0.7\nVERSION 0.7\nFIELDS x y z\n")
            f.write("SIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n")
            f.write("WIDTH 7\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n")
            f.write("POINTS 7\nDATA ascii\n")
            for row in pts:
                f.write(f"{row[0]} {row[1]} {row[2]}\n")
        np.testing.assert_allclose(io.read_pcd(str(p)), pts, atol=1e-5)

    def test_pcd_binary_with_intensity(self, tmp_path, rng):
        pts = rng.randn(9, 4).astype(np.float32)
        p = tmp_path / "b.pcd"
        with open(p, "wb") as f:
            hdr = (
                "VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\n"
                "TYPE F F F F\nCOUNT 1 1 1 1\nWIDTH 9\nHEIGHT 1\n"
                "POINTS 9\nDATA binary\n"
            )
            f.write(hdr.encode())
            f.write(pts.tobytes())
        np.testing.assert_allclose(io.read_pcd(str(p)), pts[:, :3], atol=1e-6)

    def test_kitti_bin(self, tmp_path, rng):
        pts = rng.randn(20, 4).astype(np.float32)
        p = tmp_path / "000000.bin"
        pts.tofile(p)
        np.testing.assert_allclose(io.read_kitti_bin(str(p)), pts[:, :3])

    def test_read_points_dispatch(self, tmp_path, rng):
        pts = rng.randn(4, 3).astype(np.float32)
        np.save(tmp_path / "x.npy", pts)
        np.testing.assert_allclose(io.read_points(str(tmp_path / "x.npy")), pts)
        with pytest.raises(ValueError):
            io.read_points("/nope/file.xyz")


class TestTrajectoryLog:
    def test_roundtrip(self, tmp_path, rng):
        pairs = np.asarray([[0, 1, 50], [0, 3, 50]])
        poses = np.tile(np.eye(4), (2, 1, 1))
        poses[1, :3, 3] = [1, 2, 3]
        p = write_trajectory_log(str(tmp_path / "gt.log"), pairs, poses)
        rp, rposes = read_trajectory_log(p)
        np.testing.assert_array_equal(rp, pairs)
        np.testing.assert_allclose(rposes, poses, rtol=1e-6)

    def test_info_parse(self, tmp_path):
        with open(tmp_path / "gt.info", "w") as f:
            f.write("0 1 50\n")
            for r in range(6):
                f.write(" ".join(str(float(r == c)) for c in range(6)) + "\n")
        pairs, infos = read_trajectory_info(str(tmp_path / "gt.info"))
        assert pairs.shape == (1, 3)
        np.testing.assert_allclose(infos[0], np.eye(6))


class TestWalking:
    def test_walk_distance(self):
        # poses along a line, 1 m apart; pdist 2.5 -> pairs (0,3),(3,6),...
        positions = np.stack(
            [np.arange(10), np.zeros(10), np.zeros(10)], axis=-1
        ).astype(float)
        pairs = walk_odometry_pairs(positions, 2.5)
        assert pairs[0] == (0, 3)
        assert pairs[1] == (3, 6)

    def test_exclusion_drops_exactly_the_poisoned_pair(self):
        # synthetic trajectory 1 m/frame; pdist 2.5 -> (0,3),(3,6),(6,9)
        positions = np.stack(
            [np.arange(12), np.zeros(12), np.zeros(12)], axis=-1
        ).astype(float)
        full = walk_odometry_pairs(positions, 2.5)
        poisoned = full[1]  # (3, 6)
        pairs = walk_odometry_pairs(positions, 2.5, exclude=(poisoned,))
        assert poisoned not in pairs
        assert pairs == [p for p in full if p != poisoned]

    def test_kitti_bad_pair_excluded(self):
        # KITTIDataset.exclude must name the reference's bad pair
        # (drive 8, frames 15 -> 58) on the test split only
        from bufferx_tpu.data.datasets import KITTIDataset

        ds = KITTIDataset.__new__(KITTIDataset)
        ds.split = "test"
        assert ds.exclude(8) == ((15, 58),)
        assert ds.exclude(0) == ()
        ds.split = "train"
        assert ds.exclude(8) == ()


class TestICP:
    def test_refines_to_gt(self, rng):
        src = rng.randn(500, 3) * 2
        T_gt = np.eye(4)
        T_gt[:3, 3] = [0.05, -0.03, 0.02]
        tgt = src @ T_gt[:3, :3].T + T_gt[:3, 3]
        out = icp_refine(src, tgt, np.eye(4), max_dist=0.2)
        np.testing.assert_allclose(out, T_gt, atol=1e-4)


class TestLoaders:
    def _make_eth(self, root, rng):
        scene = os.path.join(root, "gazebo_summer")
        os.makedirs(scene, exist_ok=True)
        pts = (rng.randn(3000, 3) * 2).astype(np.float32)
        for i in range(2):
            with open(os.path.join(scene, f"Hokuyo_{i}.ply"), "wb") as f:
                f.write(b"ply\nformat binary_little_endian 1.0\n")
                f.write(b"element vertex 3000\n")
                f.write(
                    b"property float x\nproperty float y\nproperty float z\n"
                )
                f.write(b"end_header\n")
                f.write(pts.astype("<f4").tobytes())
        T = np.eye(4)
        write_trajectory_log(
            os.path.join(scene, "gt.log"), [[0, 1, 2]], [T]
        )

    def test_eth_loader(self, tmp_path, rng):
        self._make_eth(str(tmp_path), rng)
        cfg = make_cfg("ETH", str(tmp_path))
        ds = ETHDataset(cfg)
        assert len(ds) == 1
        sample = ds[0]
        assert sample["src_points"].shape[1] == 3
        assert sample["relt_pose"].shape == (4, 4)
        assert sample["dataset_name"] == "ETH"
        assert isinstance(sample["is_aligned_to_global_z"], bool)

    def _make_3dmatch_train(self, root, rng):
        import pickle

        from bufferx_tpu.utils.vis import save_ply

        train = os.path.join(root, "train")
        poses = {}
        overlap = {}
        for scene in ("scene-a", "scene-b"):
            seq = os.path.join(train, scene, "seq-01")
            os.makedirs(seq, exist_ok=True)
            for i in range(3):
                pts = (rng.randn(800, 3)).astype(np.float32)
                T = np.eye(4)
                T[:3, 3] = rng.randn(3)
                fid = f"{scene}/seq-01/cloud_bin_{i}"
                save_ply(os.path.join(train, fid + ".ply"), pts)
                np.save(os.path.join(train, fid + ".pose.npy"), T)
                poses[fid] = T
            overlap[f"{scene}/seq-01/cloud_bin_0@{scene}/seq-01/cloud_bin_1"] = 0.7
            overlap[f"{scene}/seq-01/cloud_bin_1@{scene}/seq-01/cloud_bin_2"] = 0.5
        with open(os.path.join(train, "3DMatch_train_overlap.pkl"), "wb") as f:
            pickle.dump(overlap, f)
        with open(os.path.join(train, "train_3dmatch.txt"), "w") as f:
            f.write("scene-a\n")
        with open(os.path.join(train, "val_3dmatch.txt"), "w") as f:
            f.write("scene-b\n")
        return poses

    def test_3dmatch_train_val_pairing(self, tmp_path, rng):
        from bufferx_tpu.data.datasets import ThreeDMatchDataset

        poses = self._make_3dmatch_train(str(tmp_path), rng)
        cfg = make_cfg("3DMatch", str(tmp_path))
        ds_train = ThreeDMatchDataset(cfg, "train")
        ds_val = ThreeDMatchDataset(cfg, "val")
        # splits are disjoint by scene and never touch the test benchmark
        assert len(ds_train) == 2 and len(ds_val) == 2
        assert all(a.startswith("scene-a") for p in ds_train.pairs for a in p)
        assert all(b.startswith("scene-b") for p in ds_val.pairs for b in p)
        src, tgt, relt, src_id, tgt_id, _ = ds_train.load_pair(
            ds_train.pairs[0]
        )
        np.testing.assert_allclose(
            relt, np.linalg.inv(poses[tgt_id]) @ poses[src_id], atol=1e-6
        )
        sample = ds_train[0]
        assert sample["src_points"].shape[1] == 3
        assert sample["relt_pose"].shape == (4, 4)

    def test_3dmatch_train_refuses_without_manifest(self, tmp_path):
        # no train manifest -> training must fail loudly, never fall back
        # to enumerating the test benchmark (the round-1 protocol bug)
        from bufferx_tpu.data.datasets import ThreeDMatchDataset

        os.makedirs(tmp_path / "test" / "3DMatch", exist_ok=True)
        cfg = make_cfg("3DMatch", str(tmp_path))
        with pytest.raises(FileNotFoundError, match="test benchmark"):
            ThreeDMatchDataset(cfg, "train")

    def test_missing_root_raises_with_hint(self, tmp_path):
        cfg = make_cfg("KITTI", str(tmp_path / "nope"))
        with pytest.raises(FileNotFoundError, match="expected layout"):
            get_dataset(cfg)[0] if len(get_dataset(cfg)) else None

    def test_factory_dispatch(self, tmp_path, rng):
        self._make_eth(str(tmp_path), rng)
        cfg = make_cfg("ETH", str(tmp_path))
        ds = get_dataset(cfg)
        assert isinstance(ds, ETHDataset)
        with pytest.raises(ValueError):
            get_dataset(cfg.override(data=dict(dataset="Bogus")))
