"""End-to-end ScanNet++ iPhone offline pipeline on a synthetic scene.

Synthesizes a raw scene (zlib depth stream + pose/intrinsic JSON) of a
camera looking at a fixed bumpy wall from slightly different poses, runs
the full prepare pipeline (depth decode -> TSDF fragments -> overlap-
filtered gt.log), and checks the output loads through
ScannetppIphoneDataset with a consistent relative pose.
"""

import json
import os
import zlib
from os.path import join

import numpy as np
import pytest

from bufferx_tpu.tools.scannetpp import (
    DEPTH_H,
    DEPTH_W,
    INTRINSIC_SCALE,
    SceneLayout,
    extract_depth,
    extract_intrinsics,
    extract_poses,
    prepare_scene,
    rgb_ffmpeg_command,
)


def render_depth(K, cam2world, z_wall=2.0):
    """Analytic depth of the plane z_world = z_wall with small bumps."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u, v = np.meshgrid(np.arange(DEPTH_W), np.arange(DEPTH_H))
    rays = np.stack(
        [(u - cx) / fx, (v - cy) / fy, np.ones_like(u, np.float64)], -1
    )
    R, t = cam2world[:3, :3], cam2world[:3, 3]
    rays_w = rays @ R.T
    # intersect with z = z_wall (+ bumps as depth modulation)
    s = (z_wall - t[2]) / np.maximum(rays_w[..., 2], 1e-6)
    pts = t + s[..., None] * rays_w
    bump = 0.03 * np.sin(4 * pts[..., 0]) * np.cos(4 * pts[..., 1])
    depth = (s * rays[..., 2] + bump).astype(np.float32)  # z-depth
    depth[(s <= 0.1) | (s > 5.5)] = 0.0
    return depth


@pytest.fixture(scope="module")
def raw_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("scannetpp") / "scene0"
    scene = SceneLayout(str(root))
    os.makedirs(scene.iphone_dir)

    K_video = np.array(
        [[200.0 * INTRINSIC_SCALE, 0, 128.0 * INTRINSIC_SCALE],
         [0, 200.0 * INTRINSIC_SCALE, 96.0 * INTRINSIC_SCALE],
         [0, 0, 1.0]]
    )
    K_depth = K_video / INTRINSIC_SCALE

    # 3 fragments x 2 frames: camera at the origin looking down +z, with
    # small per-fragment translations so fragments overlap heavily
    frames_per_fragment = 2
    poses, depths, meta = [], [], {}
    for t in range(6):
        frag = t // frames_per_fragment
        cam2world = np.eye(4)
        cam2world[:3, 3] = [0.05 * frag, 0.03 * frag, 0.01 * t]
        poses.append(cam2world)
        depths.append(render_depth(K_depth, cam2world))
        meta[f"frame_{t:06d}"] = dict(
            aligned_pose=cam2world.tolist(), intrinsic=K_video.tolist()
        )

    # global-zlib float32-meters stream (raw deflate)
    stream = np.stack(depths).astype(np.float32).tobytes()
    comp = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    with open(scene.depth_bin_path, "wb") as f:
        f.write(comp.compress(stream) + comp.flush())
    with open(scene.pose_json_path, "w") as f:
        json.dump(meta, f)
    return scene, frames_per_fragment


class TestExtraction:
    def test_depth_poses_intrinsics(self, raw_scene):
        scene, _ = raw_scene
        assert extract_depth(scene) == 6
        assert extract_poses(scene) == 6
        assert extract_intrinsics(scene) == 6
        d = np.load(join(scene.depth_dir, "frame_000000.depth.npy"))
        assert d.shape == (DEPTH_H, DEPTH_W) and d.dtype == np.uint16
        assert 1500 < np.median(d[d > 0]) < 2500  # ~2 m wall in mm
        K = np.loadtxt(
            join(scene.intrinsic_dir, "frame_000000.intrinsic.txt")
        )
        np.testing.assert_allclose(K[0, 0], 200.0)  # scaled to depth res

    def test_ffmpeg_contract_documented(self, raw_scene):
        scene, _ = raw_scene
        cmd = rgb_ffmpeg_command(scene)
        assert "ffmpeg" in cmd and "frame_%06d.color.jpg" in cmd


class TestFullPipeline:
    def test_prepare_scene_to_dataset(self, raw_scene, tmp_path):
        scene, fpf = raw_scene
        stats = prepare_scene(
            str(scene.root),
            frames_per_fragment=fpf,
            voxel_size=0.05,
            grid_dims=(64, 64, 64),
            grid_origin=(-1.6, -1.6, 0.4),
            pair_kw=dict(keep_prob=1.0),  # tiny fixture: keep all pairs
        )
        assert stats["fragments"] >= 2
        assert stats["pairs"] >= 1
        assert os.path.exists(join(scene.iphone_dir, "gt.log"))
        assert os.path.exists(join(scene.iphone_dir, "valid_pcd_files.txt"))

        # the produced scene loads through the dataset layer
        import shutil

        from bufferx_tpu.config import make_cfg
        from bufferx_tpu.data.datasets import ScannetppIphoneDataset

        root = tmp_path / "ds_root"
        os.makedirs(root)
        shutil.copytree(scene.root, root / "scene0")
        cfg = make_cfg("Scannetpp_iphone", str(root))
        ds = ScannetppIphoneDataset(cfg)
        assert len(ds) == stats["pairs"]
        src, tgt, relt, *_ = ds.load_pair(ds.pairs[0])
        assert len(src) > 100 and len(tgt) > 100
        # fragments live in their base-frame; relt = inv(gt.log pose) must
        # put src near tgt (fragments of a static wall)
        from scipy.spatial import cKDTree

        warped = src @ relt[:3, :3].T + relt[:3, 3]
        d, _ = cKDTree(tgt).query(warped)
        assert np.median(d) < 0.08
