from real_time_audio_sync_tpu.models.dtw import DTW  # noqa: F401
