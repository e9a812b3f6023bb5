from bufferx_tpu.solver.consensus import cross_scale_consensus  # noqa: F401
from bufferx_tpu.solver.gnc import gnc_tls_solve  # noqa: F401
from bufferx_tpu.solver.irls import post_refinement  # noqa: F401
from bufferx_tpu.solver.ransac import ransac_pose  # noqa: F401
from bufferx_tpu.solver.so2 import so2_pose_candidates  # noqa: F401
