from bufferx_tpu.train.losses import (  # noqa: F401
    contrastive_loss,
    huber_loss,
    so2_cross_entropy,
)
from bufferx_tpu.train.forward import (  # noqa: F401
    TrainStatics,
    cal_so2_gt,
    desc_stage_loss,
    pose_stage_loss,
    sample_gt_correspondences,
)
