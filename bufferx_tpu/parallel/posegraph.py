"""Multi-frame pose-graph optimization, sharded over the mesh.

The genuinely new capability vs. the reference (SURVEY §2.7 / BASELINE
north star): pairwise registrations become relative-pose factors of a graph
over frames; Gauss-Newton refines all poses jointly. TPU design:

- chordal residuals (rotation-matrix difference + translation) — polynomial
  in the unknowns, autodiff-friendly, no manifold retraction inside the
  linear solve; increments are axis-angle left-perturbations re-applied
  after each step;
- per-factor Jacobians via ``jacfwd`` on a fixed-size factor batch; the
  normal equations J^T J / J^T r are *accumulated over factor shards* with
  ``psum`` across the mesh ("fp" axis) — the distributed-reduction pattern
  the north star names — and solved replicated (6K x 6K, dense: fine for
  hundreds of frames);
- gauge freedom fixed by a strong prior on frame 0;
- per-factor weights let callers plug confidence (e.g. solver inlier
  counts) straight in; invalid/padded factors carry weight 0.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from bufferx_tpu.core.se3 import axis_angle_to_rotation, decompose, integrate

__all__ = ["PoseGraph", "pose_graph_gauss_newton", "chain_initialization"]


class PoseGraph(NamedTuple):
    """Factors: edge (i, j) measures T_ij with ``tgt ≈ T_ij @ src`` frames:
    T_j ≈ T_i @ T_ij (world-from-frame convention)."""

    edges_i: jnp.ndarray   # [E] int32
    edges_j: jnp.ndarray   # [E] int32
    t_meas: jnp.ndarray    # [E, 4, 4]
    weights: jnp.ndarray   # [E] f32 (0 = disabled / padding)


def chain_initialization(graph: PoseGraph, num_poses: int) -> jnp.ndarray:
    """Odometry-style init: compose measurements along the chain edges
    (i, i+1); non-chain edges are ignored. Returns [K, 4, 4]."""
    import numpy as np

    ei = np.asarray(graph.edges_i)
    ej = np.asarray(graph.edges_j)
    tm = np.asarray(graph.t_meas)
    poses = [np.eye(4, dtype=np.float32)]
    for k in range(1, num_poses):
        found = np.where((ei == k - 1) & (ej == k))[0]
        step = tm[found[0]] if len(found) else np.eye(4, dtype=np.float32)
        poses.append(poses[-1] @ step)
    return jnp.asarray(np.stack(poses))


def _apply_increment(poses: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Left-perturbation: T_k <- [exp(w_k), v_k] @ T_k. delta: [K, 6]."""
    R_inc = axis_angle_to_rotation(delta[:, :3])
    R, t = decompose(poses)
    return integrate(R_inc @ R, (R_inc @ t[..., None])[..., 0] + delta[:, 3:])


def _factor_residual(delta, poses, ei, ej, t_meas, w):
    """Chordal residual of one factor under pose increments. -> [12]"""
    Ti = _apply_increment(poses[ei][None], delta[ei][None])[0]
    Tj = _apply_increment(poses[ej][None], delta[ej][None])[0]
    Ri, ti = decompose(Ti)
    Rj, tj = decompose(Tj)
    Rij, tij = decompose(t_meas)
    r_rot = (Ri @ Rij - Rj).reshape(9)
    r_tr = (Ri @ tij[:, None])[:, 0] + ti - tj
    return jnp.concatenate([r_rot, r_tr]) * w


def _accumulate_normal_eqs(delta, poses, graph: PoseGraph, num_poses: int):
    """Dense J^T J [6K, 6K] and J^T r [6K] accumulated over local factors."""
    k6 = num_poses * 6

    def one_factor(ei, ej, t_meas, w):
        def res_of_delta(d):
            return _factor_residual(d, poses, ei, ej, t_meas, w)

        return (
            jax.jacfwd(res_of_delta)(delta).reshape(12, k6),
            res_of_delta(delta),
        )

    J, r = jax.vmap(one_factor)(
        graph.edges_i, graph.edges_j, graph.t_meas, graph.weights
    )                                        # [E, 12, 6K], [E, 12]
    hp = jax.lax.Precision.HIGHEST
    JTJ = jnp.einsum("eri,erj->ij", J, J, precision=hp)
    JTr = jnp.einsum("eri,er->i", J, r, precision=hp)
    return JTJ, JTr


def _robust_factor_weights(poses, graph: PoseGraph, robust: str,
                           scale: float) -> jnp.ndarray:
    """IRLS reweighting of factor weights from current residual norms."""
    from bufferx_tpu.parallel.bundle import robust_weight

    delta0 = jnp.zeros((poses.shape[0], 6), poses.dtype)
    r = jax.vmap(
        lambda ei, ej, tm: _factor_residual(
            delta0, poses, ei, ej, tm, jnp.float32(1.0)
        )
    )(graph.edges_i, graph.edges_j, graph.t_meas)          # [E, 12]
    return graph.weights * robust_weight(
        jnp.linalg.norm(r, axis=-1), robust, scale
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_poses", "num_iters", "mesh", "axis", "robust"),
)
def pose_graph_gauss_newton(
    graph: PoseGraph,
    poses_init: jnp.ndarray,     # [K, 4, 4]
    num_poses: int,
    num_iters: int = 10,
    damping: float = 1e-6,
    anchor_weight: float = 1e6,
    mesh: Mesh | None = None,
    axis: str = "fp",
    robust: str = "none",
    robust_scale: float = 1.0,
) -> jnp.ndarray:
    """GN refinement of all frame poses. Returns [K, 4, 4].

    With ``mesh``, factors are sharded over ``axis`` and the normal
    equations are psum-accumulated (pad E to a multiple of the mesh size
    with weight-0 factors). ``robust`` ("huber" / "gm") applies IRLS
    reweighting of factors from their chordal residual norms each
    iteration — outlier loop closures get down-weighted instead of
    dragging the solution.
    """
    k6 = num_poses * 6

    def normal_eqs(delta, poses, g: PoseGraph):
        if mesh is None:
            return _accumulate_normal_eqs(delta, poses, g, num_poses)

        def local(ei, ej, tm, w):
            JTJ, JTr = _accumulate_normal_eqs(
                delta, poses, PoseGraph(ei, ej, tm, w), num_poses
            )
            return jax.lax.psum(JTJ, axis), jax.lax.psum(JTr, axis)

        spec = P(axis)
        return shard_map(
            local, mesh=mesh,
            in_specs=(spec, spec, spec, spec),
            out_specs=(P(), P()),
            check_vma=False,
        )(g.edges_i, g.edges_j, g.t_meas, g.weights)

    def gn_iter(_, poses):
        delta0 = jnp.zeros((num_poses, 6), poses.dtype)
        g = graph
        if robust != "none":
            g = g._replace(
                weights=_robust_factor_weights(poses, g, robust, robust_scale)
            )
        JTJ, JTr = normal_eqs(delta0, poses, g)
        # gauge: anchor frame 0 (prior on its 6 increment dims).
        # Damping is RELATIVE to the problem scale (Levenberg-style):
        # a fixed 1e-6 is numerically invisible next to sqrt(inlier)
        # factor weights and leaves disconnected/weakly-constrained
        # blocks near-singular — the f32 solve then emits garbage steps
        # that compound into NaN poses over iterations.
        scale = jnp.trace(JTJ) / k6
        anchor = jnp.zeros(k6).at[:6].set(anchor_weight)
        JTJ = JTJ + jnp.diag(
            anchor + damping * jnp.maximum(scale, 1.0)
        )
        step = -jnp.linalg.solve(JTJ, JTr)
        # a non-finite or exploding step (singular block) must not
        # poison the whole trajectory: zero it and let the damped next
        # iteration retry
        step = jnp.where(jnp.isfinite(step), step, 0.0)
        return _apply_increment(poses, step.reshape(num_poses, 6))

    return jax.lax.fori_loop(0, num_iters, gn_iter, poses_init)
