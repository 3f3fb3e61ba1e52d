"""real_time_audio_sync_tpu — a TPU-native (JAX/XLA/Pallas) streaming
audio-alignment framework with the full capabilities of
smritip/real-time-audio-sync (reference mounted at /root/reference).

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):

- ``features``  — chroma feature frontend: batched MXU-friendly STFT (DFT as
  matmul), chroma filterbank derived in-repo (no librosa runtime dep),
  L2-normalized 12-bin chroma and rectified chroma-diff variants.
  [reference: chroma.py]
- ``ops``       — core DP kernels: anti-diagonal wavefront DTW (lax.scan),
  banded min-plus row/column updates for online time warping.
  [reference: dtw.py, otw_eran.py inner loops]
- ``models``    — the alignment engine zoo with the reference API surface:
  DTW, OnlineTimeWarping, LiveNote, LiveNoteV2, WTW.
  [reference: dtw.py, otw_eran.py, livenote.py, livenote_v2.py, wtw.py]
- ``streaming`` — host-side real-time runtime: frame sources (wav chunker,
  simulated mic), ring-buffer hop framing, ScoreFollower, audio writer,
  live app shell. [reference: ims/, livenote_live.py, wtw_live.py]
- ``eval``      — ground-truth beat scorer, corpus runner, field-log
  record/replay. [reference: tests.py, test_simple.py, wtw.py:259-359]
- ``parallel``  — multi-chip corpus alignment: vmapped engines sharded over a
  jax.sharding.Mesh (data parallel over song pairs; sequence-sharded feature
  extraction). [reference has no distributed execution — see SURVEY.md §2]
- ``utils``     — wav IO (librosa.load-parity), profiling, checkpointing.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compilation cache: the tunneled-TPU environment recompiles each
# program remotely per process (20-350 s for the larger engine programs);
# caching executables on disk makes that a one-time cost.  Scoped to the TPU
# platform — CPU compiles are fast and cached CPU AOT artifacts don't port
# across host machine features.  Opt out with RTAS_NO_COMPILE_CACHE=1.
if not _os.environ.get("RTAS_NO_COMPILE_CACHE") and "cpu" not in _os.environ.get("JAX_PLATFORMS", "axon"):
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("RTAS_COMPILE_CACHE_DIR", _os.path.expanduser("~/.cache/rtas_jax_cache")),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from real_time_audio_sync_tpu.features.chroma import (  # noqa: F401
    wav_to_chroma,
    wav_to_chroma_col,
    wav_to_chroma_diff,
)
