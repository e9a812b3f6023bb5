from bufferx_tpu.utils.timers import AverageMeter, DeviceTimer, Timer  # noqa: F401
