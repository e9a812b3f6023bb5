"""Hard synthetic benchmark generator properties."""

import numpy as np

from bufferx_tpu.data.base import compute_overlap_ratio
from bufferx_tpu.data.hardsynth import (
    eval_scene,
    hard_pair,
    sample_scene,
    train_scene,
)


class TestSceneSampling:
    def test_independent_samples(self):
        # the whole point: src and tgt share the surface, NOT the samples
        rs = np.random.RandomState(0)
        prims = eval_scene(rs)
        a = sample_scene(prims, rs, 4000)
        b = sample_scene(prims, rs, 4000)
        from scipy.spatial import cKDTree

        d, _ = cKDTree(b).query(a)
        assert (d == 0).mean() < 0.01       # no shared point identities
        assert np.median(d) < 0.1           # ...but the same surface

    def test_families_are_distinct_scales(self):
        rs = np.random.RandomState(1)
        tr = sample_scene(train_scene(rs), rs, 3000)
        ev = sample_scene(eval_scene(rs, extent=3.0), rs, 3000)
        assert (tr.max(0) - tr.min(0)).max() < 2.5
        assert (ev.max(0) - ev.min(0)).max() > 2.5


class TestHardPair:
    def test_overlap_ratio_controlled(self):
        rs = np.random.RandomState(2)
        for r in (0.15, 0.5, 0.8):
            measured = []
            for _ in range(3):
                src, tgt, T = hard_pair(
                    rs, overlap_ratio=r, num_points=8000
                )
                o0, o1 = compute_overlap_ratio(src, tgt, T, 0.06)
                measured.append(max(o0, o1))
            assert abs(np.mean(measured) - r) < 0.12, (r, measured)

    def test_density_and_clutter_knobs(self):
        rs = np.random.RandomState(3)
        src, tgt, _ = hard_pair(
            rs, overlap_ratio=0.5, density_ratio=8.0, num_points=8000
        )
        assert len(src) > 5 * len(tgt)      # hetero density
        src_c, tgt_c, _ = hard_pair(
            rs, overlap_ratio=0.5, outlier_frac=0.2, num_points=8000
        )
        base, _, _ = hard_pair(rs, overlap_ratio=0.5, num_points=8000)
        assert len(src_c) > len(base) * 1.1  # clutter added

    def test_gt_maps_src_onto_tgt(self):
        rs = np.random.RandomState(4)
        src, tgt, T = hard_pair(rs, overlap_ratio=0.9, num_points=8000)
        from scipy.spatial import cKDTree

        warped = src @ T[:3, :3].T + T[:3, 3]
        d, _ = cKDTree(tgt).query(warped)
        assert np.median(d) < 0.08          # surface-level agreement


class TestTrainingStream:
    def test_yields_valid_batches(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        from bufferx_tpu.config import make_cfg
        from bufferx_tpu.data.hardsynth import hard_training_stream

        cfg = make_cfg("ModelNet40").override(
            capacity=dict(max_points=2048)
        )
        batches = list(hard_training_stream(cfg, 2, seed=5, num_points=3000))
        assert len(batches) == 2
        b = batches[0]
        assert b["src_fds"].shape == (2048, 3)
        assert bool(b["corr_valid"].any())
