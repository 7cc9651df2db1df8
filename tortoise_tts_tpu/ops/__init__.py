from . import attention, sampling, stft  # noqa: F401
