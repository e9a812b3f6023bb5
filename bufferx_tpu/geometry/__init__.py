from bufferx_tpu.geometry.cylindrical import (  # noqa: F401
    grid_cell_centers,
    spatial_point_transformer,
    var_to_invar,
)
from bufferx_tpu.geometry.lrf import align_patches, compute_z_axis  # noqa: F401
from bufferx_tpu.geometry.patches import select_patches  # noqa: F401
from bufferx_tpu.geometry.sphericity import (  # noqa: F401
    sphericity_based_voxel_analysis,
)
