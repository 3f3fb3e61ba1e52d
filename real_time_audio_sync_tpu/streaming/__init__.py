from real_time_audio_sync_tpu.streaming.audio_io import (  # noqa: F401
    BufferSink,
    ClickTrack,
    DuplexAudio,
    WavFileSink,
    WavPlayback,
)
from real_time_audio_sync_tpu.streaming.runtime import HopFramer, ScoreFollower  # noqa: F401
from real_time_audio_sync_tpu.streaming.sources import SimulatedMic, WavChunkSource  # noqa: F401
from real_time_audio_sync_tpu.streaming.writer import AudioWriter, combine_buffers, write_wave_file  # noqa: F401
