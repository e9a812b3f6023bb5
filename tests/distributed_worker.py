"""Multi-process ``jax.distributed`` worker (VERDICT r4 #2 / round-5 #4).

Launched twice by ``tests/test_parallel.py::TestMultiProcessDistributed``
(and usable standalone):

    python tests/distributed_worker.py PORT PROCESS_ID OUTFILE

Each process owns 4 virtual CPU devices; the pair forms one 8-device
global mesh via ``jax.distributed.initialize``. The worker runs the
factor-sharded robust pose-graph GN across BOTH processes and a psum
probe, then process 0 checks parity against the local (unsharded)
solution — exercising the multi-controller class of bugs (global vs
local device indexing, cross-process collectives, committed global
arrays) that a single-process virtual mesh cannot.
"""

import os
import sys


def main() -> int:
    port, pid, outfile = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4 "
        + os.environ.get("XLA_FLAGS", "")
    )
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 4

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("fp",))

    # --- psum probe across processes --------------------------------
    def local_sum(x):
        return jax.lax.psum(jnp.sum(x), "fp")

    xs_host = np.arange(16, dtype=np.float32).reshape(8, 2)
    xs = jax.device_put(xs_host, NamedSharding(mesh, P("fp")))
    total = shard_map(
        local_sum, mesh=mesh, in_specs=(P("fp"),), out_specs=P(),
        check_vma=False,
    )(xs)
    got = float(jax.device_get(total))
    assert got == float(xs_host.sum()), (got, xs_host.sum())

    # --- factor-sharded pose-graph GN across processes --------------
    from bufferx_tpu.parallel.posegraph import (
        PoseGraph,
        chain_initialization,
        pose_graph_gauss_newton,
    )
    from tests.test_parallel import make_ring_graph

    rs = np.random.RandomState(3)
    graph, gt = make_ring_graph(rs, k=6, noise_rot=0.03, noise_tr=0.03)
    e = len(np.asarray(graph.weights))
    pad = (-e) % 8
    graph_p = PoseGraph(
        jnp.concatenate([graph.edges_i, jnp.zeros(pad, jnp.int32)]),
        jnp.concatenate([graph.edges_j, jnp.zeros(pad, jnp.int32)]),
        jnp.concatenate(
            [graph.t_meas, jnp.tile(jnp.eye(4)[None], (pad, 1, 1))]
        ),
        jnp.concatenate([graph.weights, jnp.zeros(pad)]),
    )
    init = chain_initialization(graph, 6)

    single = pose_graph_gauss_newton(
        graph_p, init, num_poses=6, num_iters=8
    )
    # commit the factor arrays as GLOBAL sharded arrays spanning both
    # processes (each host holds the identical full array; device_put
    # slices out this process's addressable shards)
    shard = NamedSharding(mesh, P("fp"))
    graph_g = PoseGraph(
        jax.device_put(graph_p.edges_i, shard),
        jax.device_put(graph_p.edges_j, shard),
        jax.device_put(graph_p.t_meas, shard),
        jax.device_put(graph_p.weights, shard),
    )
    sharded = pose_graph_gauss_newton(
        graph_g, jax.device_put(init, NamedSharding(mesh, P())),
        num_poses=6, num_iters=8, mesh=mesh, axis="fp",
    )
    s_host = np.asarray(jax.device_get(sharded))
    np.testing.assert_allclose(
        s_host, np.asarray(jax.device_get(single)), atol=1e-4
    )

    if pid == 0:
        with open(outfile, "w") as f:
            f.write("OK devices=%d processes=%d\n"
                    % (jax.device_count(), jax.process_count()))
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
