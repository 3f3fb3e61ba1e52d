from real_time_audio_sync_tpu.native.bindings import (  # noqa: F401
    NativeRingBuffer,
    native_available,
    native_decode_wav,
)
