from bufferx_tpu.parallel.bundle import (  # noqa: F401
    LandmarkGraph,
    bundle_adjust,
    robust_weight,
)
from bufferx_tpu.parallel.mesh import make_mesh  # noqa: F401
from bufferx_tpu.parallel.posegraph import (  # noqa: F401
    PoseGraph,
    pose_graph_gauss_newton,
)
from bufferx_tpu.parallel.sharded import (  # noqa: F401
    make_sharded_eval,
    make_sharded_train_step,
)
