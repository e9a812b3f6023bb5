from bufferx_tpu.kernels.fps import farthest_point_sampling  # noqa: F401
from bufferx_tpu.kernels.neighbors import (  # noqa: F401
    ball_query,
    masked_sqdist,
    mutual_nearest,
    nearest_neighbor,
    sqdist,
)
from bufferx_tpu.kernels.radius import density_aware_radius  # noqa: F401
from bufferx_tpu.kernels.voxel import (  # noqa: F401
    voxel_downsample,
    voxel_downsample_np,
)
