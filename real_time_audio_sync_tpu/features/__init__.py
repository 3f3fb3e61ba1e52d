from real_time_audio_sync_tpu.features.chroma import (  # noqa: F401
    chroma_from_samples,
    chroma_frames,
    create_chroma,
    create_stft,
    wav_to_chroma,
    wav_to_chroma_col,
    wav_to_chroma_diff,
)
from real_time_audio_sync_tpu.features.filterbank import chroma_filterbank  # noqa: F401
