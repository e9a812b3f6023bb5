from bufferx_tpu.pipeline.registration import (  # noqa: F401
    Cloud,
    RegistrationResult,
    build_models,
    init_params,
    prepare_cloud,
    register_pair,
    register_pair_jit,
)
