from bufferx_tpu.models.heads import CostVolume, equi_match_scores  # noqa: F401
from bufferx_tpu.models.spinnet import MiniSpinNet  # noqa: F401
