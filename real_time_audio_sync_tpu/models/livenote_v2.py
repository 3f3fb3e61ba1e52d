"""LiveNoteV2 — LiveNote plus path monotonicity and chroma-diff cost
(reference livenote_v2.py:3-236).

A best point is appended only when strictly forward in live and non-backward
in ref (livenote_v2.py:197-199); with ``chroma_diff=True`` the cell cost is
the Euclidean distance between (rectified chroma-diff) feature columns
instead of the cosine cost (livenote_v2.py:167-170).

Engine selection caveat (measured, docs/ACCURACY.md): ``chroma_diff=True``
trades noise robustness for tacet robustness — it is best-in-class through
silence/dropout passages (onset-sensitive cost ignores sustain) but
collapses under heavy broadband noise or detune (76-83% of beats >1 beat
off on the adversarial corpus, vs ~0% for the cosine-cost engines).  Use
the default cosine cost for noisy capture chains; see the "which engine
when" matrix in README.md.
"""

from __future__ import annotations

from real_time_audio_sync_tpu.models.online_core import ENGINE_OVERRIDES, BandedOnlineEngine


class LiveNoteV2(BandedOnlineEngine):
    def __init__(self, ref, params, debug_params=None, chroma_diff=False, dtype=None, exact_chain=False):
        del debug_params  # accepted-but-unused, reference parity
        super().__init__(
            ref,
            params,
            dict(ENGINE_OVERRIDES["livenote_v2_diff" if chroma_diff else "livenote_v2"]),
            dtype=dtype,
            exact_chain=exact_chain,
        )
        self.chroma_diff = bool(chroma_diff)

    @property
    def search_band_width(self):
        return self.cfg.c

    @property
    def max_run_count(self):
        return self.cfg.max_run_count
