from real_time_audio_sync_tpu.models.dtw import DTW  # noqa: F401
from real_time_audio_sync_tpu.models.livenote import LiveNote  # noqa: F401
from real_time_audio_sync_tpu.models.livenote_v2 import LiveNoteV2  # noqa: F401
from real_time_audio_sync_tpu.models.otw import OnlineTimeWarping  # noqa: F401
from real_time_audio_sync_tpu.models.wtw import WTW  # noqa: F401
from real_time_audio_sync_tpu.models.fused_streaming import FusedStreamingEngine  # noqa: F401
from real_time_audio_sync_tpu.models.wtw_async import AsyncWTW  # noqa: F401
