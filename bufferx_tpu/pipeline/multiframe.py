"""Multi-frame SLAM front-end: sequences -> registrations -> pose graph.

The capability the north star adds beyond the reference (which is strictly
pairwise): consume a scan sequence, register odometry pairs (and loop
closures), assemble relative-pose factors weighted by solver confidence,
and refine all frame poses jointly with the mesh-shardable Gauss-Newton
layer (:mod:`bufferx_tpu.parallel.posegraph`).

Pair registration is embarrassingly parallel — with a mesh, pairs shard
over chips via :func:`bufferx_tpu.parallel.sharded.make_sharded_eval`; the
pose-graph reduction shards over factors.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from bufferx_tpu.config import Config
from bufferx_tpu.parallel.mesh import make_mesh
from bufferx_tpu.parallel.posegraph import (
    PoseGraph,
    chain_initialization,
    pose_graph_gauss_newton,
)
from bufferx_tpu.parallel.sharded import make_sharded_eval
from bufferx_tpu.pipeline.registration import (
    Cloud,
    PipelineStatics,
    prepare_cloud,
    register_pair_jit,
    register_pairs_batched,
)

__all__ = ["MultiFrameResult", "build_pose_graph", "register_sequence"]


class MultiFrameResult(NamedTuple):
    poses: jnp.ndarray          # [K, 4, 4] world-from-frame
    graph: PoseGraph
    pair_results: list          # per-factor RegistrationResult


def build_pose_graph(
    edges: Sequence[tuple],      # [(i, j), ...]
    measurements: Sequence,      # [4, 4] each: T with tgt ≈ T @ src
    num_inliers: Sequence[int],
    min_inliers: int = 5,
) -> PoseGraph:
    """Registration outputs -> weighted factors.

    A pair measuring ``tgt ≈ T_ij @ src`` constrains ``T_j ≈ T_i @ inv(T_ij)``
    under the world-from-frame convention, so the factor measurement is
    ``inv(T_ij)``. Confidence weight = sqrt(num_inliers), zeroed below
    ``min_inliers`` (failed registrations don't pollute the graph).
    """
    ei = jnp.asarray([e[0] for e in edges], jnp.int32)
    ej = jnp.asarray([e[1] for e in edges], jnp.int32)
    t_meas = jnp.stack(
        [jnp.linalg.inv(jnp.asarray(m, jnp.float32)) for m in measurements]
    )
    w = jnp.asarray(
        [
            np.sqrt(float(n)) if n >= min_inliers else 0.0
            for n in num_inliers
        ],
        jnp.float32,
    )
    return PoseGraph(ei, ej, t_meas, w)


def register_sequence(
    cfg: Config,
    clouds: Sequence[np.ndarray],
    params: Any,
    key: jax.Array,
    loop_closures: Sequence[tuple] = (),
    is_aligned: bool = False,
    gn_iters: int = 10,
    use_mesh: bool = False,
    robust: str | None = "huber",
    robust_scale: float = 0.3,
    batch_size: int = 8,
) -> MultiFrameResult:
    """Registers consecutive frames (+ optional loop closures) and runs
    pose-graph GN. Returns world-from-frame poses with frame 0 anchored.

    ``robust``/``robust_scale`` configure the pose-graph IRLS kernel
    (``robust=None`` disables reweighting). The 0.3 default is in
    chordal-residual units and was tuned on room-scale indoor sequences;
    outdoor/LiDAR trajectories carry larger residuals and should scale it
    with the scene (e.g. ~0.1x the typical inter-frame translation).

    Single-device edge registration goes through the BATCHED two-phase
    serving path (``register_pairs_batched`` — scale-0 for every batch
    first, multi-scale re-runs only for unconfident edges), not a B=1
    loop: the edge list is embarrassingly parallel and the batched
    program amortizes dispatch + weight traffic (round-3 measured the
    B=1 loop at 0.64 pairs/s vs 17 pairs/s for the same work batched).
    ``batch_size=1`` falls back to the per-edge loop (useful on tiny
    test shapes where the batched program's padding dominates)."""
    statics = PipelineStatics.from_config(cfg)
    k = len(clouds)
    prepared = [prepare_cloud(c, cfg, seed=i) for i, c in enumerate(clouds)]
    edges = [(i, i + 1) for i in range(k - 1)] + list(loop_closures)

    results = []
    if use_mesh and len(jax.devices()) > 1:
        mesh = make_mesh()
        n_dev = mesh.devices.size
        eval_fn = make_sharded_eval(params, statics, mesh)
        pad = (-len(edges)) % n_dev
        padded_edges = list(edges) + [edges[-1]] * pad
        src_b = jax.tree.map(
            lambda *x: jnp.stack(x), *[prepared[i] for i, _ in padded_edges]
        )
        tgt_b = jax.tree.map(
            lambda *x: jnp.stack(x), *[prepared[j] for _, j in padded_edges]
        )
        keys = jax.random.split(key, len(padded_edges))
        aligned_b = jnp.full(len(padded_edges), is_aligned)
        batch_res = eval_fn(src_b, tgt_b, aligned_b, keys)
        for n in range(len(edges)):
            results.append(
                jax.tree.map(lambda x, n=n: x[n], batch_res)
            )
    elif batch_size > 1:
        results = register_pairs_batched(
            cfg,
            [prepared[i] for i, _ in edges],
            [prepared[j] for _, j in edges],
            key, params, is_aligned, batch_size=batch_size,
        )
    else:
        for n, (i, j) in enumerate(edges):
            key, sub = jax.random.split(key)
            results.append(
                register_pair_jit(
                    params, statics, prepared[i], prepared[j],
                    jnp.asarray(is_aligned), sub,
                )
            )

    graph = build_pose_graph(
        edges,
        [np.asarray(r.pose) for r in results],
        [int(r.num_inliers) for r in results],
    )
    init = chain_initialization(graph, k)
    # Huber IRLS by default: real sequences contain failed/outlier edges
    # (low-overlap loop closures), and un-reweighted GN lets one bad
    # measurement drag every pose
    poses = pose_graph_gauss_newton(
        graph, init, num_poses=k, num_iters=gn_iters, robust=robust,
        robust_scale=robust_scale,
    )
    return MultiFrameResult(poses=poses, graph=graph, pair_results=results)
