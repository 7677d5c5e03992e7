from ecgmm_tpu.ops.spectrogram import log_spectrogram  # noqa: F401
