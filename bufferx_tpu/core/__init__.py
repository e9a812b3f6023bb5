from bufferx_tpu.core import linalg, se3  # noqa: F401
