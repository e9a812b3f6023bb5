from bufferx_tpu.data.modelnet import synthetic_pair  # noqa: F401
