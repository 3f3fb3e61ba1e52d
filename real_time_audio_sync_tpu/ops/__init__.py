from real_time_audio_sync_tpu.ops.wavefront import (  # noqa: F401
    DTW_SPEC,
    WTW_SPEC,
    StepSpec,
    backtrack,
    wavefront_dp,
)
