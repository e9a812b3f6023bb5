"""data/prefetch.py — async host input pipeline (order, overlap, errors)."""

import time

import numpy as np
import pytest

from bufferx_tpu.data.prefetch import (
    prefetch_indexed,
    prefetch_iter,
    prefetch_samples,
)


class TestOrderAndCompleteness:
    def test_indexed_order(self):
        out = list(prefetch_indexed(lambda i: i * i, 17, num_workers=3,
                                    depth=5))
        assert out == [i * i for i in range(17)]

    def test_iter_order(self):
        out = list(prefetch_iter(iter(range(23)), depth=3))
        assert out == list(range(23))

    def test_empty(self):
        assert list(prefetch_indexed(lambda i: i, 0)) == []
        assert list(prefetch_iter(iter([]))) == []

    def test_samples_dispatch_sequence(self):
        data = [dict(v=i) for i in range(9)]
        assert list(prefetch_samples(data)) == data

    def test_samples_dispatch_generator(self):
        gen = (dict(v=i) for i in range(9))
        assert list(prefetch_samples(gen)) == [dict(v=i) for i in range(9)]

    def test_disabled(self):
        data = [1, 2, 3]
        assert list(prefetch_samples(data, num_workers=0)) == data


class TestOverlap:
    def test_producer_consumer_overlap(self):
        # loader sleeps 40ms/item, consumer 40ms/item: serial ~80ms/item,
        # prefetched should approach ~max(40, 40) per item. sleep() is
        # GIL-free, so overlap is deterministic even on a loaded host;
        # measure the serial baseline empirically to absorb load jitter.
        n, d = 8, 0.04

        def load(i):
            time.sleep(d)
            return i

        t0 = time.perf_counter()
        for i in range(n):
            load(i)
            time.sleep(d)
        serial = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in prefetch_indexed(load, n, num_workers=2, depth=4):
            time.sleep(d)
        elapsed = time.perf_counter() - t0
        assert elapsed < serial * 0.9  # must overlap meaningfully

    def test_bounded_lookahead(self):
        # the window must not run arbitrarily far ahead of the consumer
        seen = []

        def load(i):
            seen.append(i)
            return i

        it = prefetch_indexed(load, 100, num_workers=1, depth=3)
        next(it)
        time.sleep(0.05)
        assert len(seen) <= 6  # depth + in-flight slack, not 100
        it.close()


class TestErrors:
    def test_indexed_error_propagates(self):
        def load(i):
            if i == 5:
                raise ValueError("boom")
            return i

        with pytest.raises(ValueError, match="boom"):
            list(prefetch_indexed(load, 10, num_workers=2, depth=3))

    def test_iter_error_propagates(self):
        def gen():
            yield 1
            raise RuntimeError("source died")

        with pytest.raises(RuntimeError, match="source died"):
            list(prefetch_iter(gen(), depth=2))


class TestHarnessIntegration:
    def test_evaluate_pairs_prefetched_matches_sync(self):
        # identical results with and without prefetching (determinism:
        # seeds are positional, keys split in consumer order)
        from bufferx_tpu.config import make_cfg
        from bufferx_tpu.data.modelnet import synthetic_pair_full_overlap
        from bufferx_tpu.eval.harness import evaluate_pairs
        from bufferx_tpu.pipeline.registration import init_params
        import jax

        cfg = make_cfg("ModelNet40").override(
            capacity=dict(max_points=1024, num_ransac_hypotheses=256,
                          ransac_chunk=128, sphere_query_chunk=32),
            patch=dict(num_fps=128, num_points_radius_estimate=128,
                       num_points_per_patch=64),
        )
        params = init_params(cfg, jax.random.PRNGKey(0))

        def make_samples():
            out = []
            for i in range(3):
                rs = np.random.RandomState(i)
                s, t, T = synthetic_pair_full_overlap(rs, num_points=900)
                out.append(dict(src_points=s, tgt_points=t, relt_pose=T,
                                src_id=i, tgt_id=i + 1))
            return out

        r_sync = evaluate_pairs(cfg, make_samples(), params,
                                prefetch_workers=0)
        r_pre = evaluate_pairs(cfg, make_samples(), params,
                               prefetch_workers=2)
        assert r_sync["num_pairs"] == r_pre["num_pairs"] == 3
        for a, b in zip(r_sync["rows"], r_pre["rows"]):
            assert a["rte"] == pytest.approx(b["rte"], abs=1e-6)
            assert a["rre"] == pytest.approx(b["rre"], abs=1e-6)
