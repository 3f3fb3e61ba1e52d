"""WTW — windowed time warping over raw audio (reference wtw.py:19-240).

The only engine that consumes **raw samples** rather than chroma columns: it
buffers incoming audio, emits a chroma column per hop, and whenever
``dtw_win_size/hop_size`` fresh live frames exist runs a full DTW on a w×w
window ``[live_ptr:+w, ref_ptr:+w]``, commits the subpath up to
``dtw_hop_size``, then advances both pointers (diagonal fallback when the
subpath never crosses the hop boundary) — wtw.py:71-130.

TPU redesign: feature columns are extracted in batch (one fused DFT-matmul
program per insert instead of a per-hop Python rfft loop), and each window
DTW runs the shared anti-diagonal wavefront kernel with WTW's step
convention (unweighted diagonal, up/left/diag tie order, back codes 3/1/2 —
ops/wavefront.py).  The window size is static, so every window alignment is
a single cached XLA program.  Pointer bookkeeping and subpath commits are
per-window host logic (O(windows), not O(frames)).

Python-2 integer-division semantics of ``dtw_win_size/hop_size`` and
``dtw_hop_size/hop_size`` (wtw.py:96-107) are preserved via floor division.
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from real_time_audio_sync_tpu.config import WTWParams
from real_time_audio_sync_tpu.features.chroma import chroma_frames
from real_time_audio_sync_tpu.ops.wavefront import WTW_SPEC, backtrack, wavefront_dp
from real_time_audio_sync_tpu.utils.wavio import load_wav


@partial(jax.jit, static_argnames=())
def _window_cost(x, y):
    """Explicit cosine cost with norm division (wtw.py:162-171): the columns
    are L2-normalized already, but the reference divides by the norms anyway
    — preserved (silent/zero columns would produce the same non-finite
    values)."""
    dots = x.T @ y
    nx = jnp.sqrt(jnp.sum(x * x, axis=0))
    ny = jnp.sqrt(jnp.sum(y * y, axis=0))
    return 1.0 - dots / (nx[:, None] * ny[None, :])


@jax.jit
def _window_dtw(x, y):
    """One w×w window alignment: cost → wavefront DP → backtracked subpath.

    Returns (D, points, length); ``points`` is end→origin, padded."""
    cost = _window_cost(x, y)
    acc, back = wavefront_dp(cost, WTW_SPEC)
    points, length = backtrack(back, WTW_SPEC)
    return acc, points, length


class WTW:
    def __init__(self, ref_recording, params, debug_params=None, dtype=None):
        self.params = WTWParams.from_any(params)
        self.debug_params = debug_params or {}
        self.dtype = np.dtype(dtype or np.float32)

        self.ref, self.fs = load_wav(ref_recording)
        assert self.fs == 22050

        self.fft_len = self.params.fft_len
        self.hop_size = self.params.hop_size
        self.dtw_win_size = self.params.dtw_win_size
        self.dtw_hop_size = self.params.dtw_hop_size

        # reference chromagram via the shared frontend (wtw.py:37-41 uses the
        # identical stft→|·|²→chromafb→L2 chain)
        from real_time_audio_sync_tpu.features.chroma import chroma_from_samples

        self.chroma_ref = chroma_from_samples(self.ref, dtype=self.dtype)

        self.N = self.chroma_ref.shape[1] * 2  # live capacity (rows)
        self.M = self.chroma_ref.shape[1]  # ref length (cols)

        self.chroma_live = np.zeros((12, self.N), self.dtype)
        # dense accumulated-cost canvas for parity/visualization: windows are
        # pasted in as they are computed (wtw.py:105)
        self.acc_cost = np.full((self.N, self.M), np.inf, self.dtype)

        self.buf: List[float] = []
        self.path: List[tuple] = []

        self.chroma_ptr = 0
        self.live_ptr = 0
        self.ref_ptr = 0

        self._w = self.dtw_win_size // self.hop_size  # window in frames
        self._hop_frames = self.dtw_hop_size // self.hop_size

    # ------------------------------------------------------------------
    def insert(self, live_audio_buf):
        """Insert raw audio samples (list or array) — wtw.py:71-130."""
        if isinstance(live_audio_buf, np.ndarray):
            live_audio_buf = live_audio_buf.tolist()
        self.buf += live_audio_buf

        if self.ref_ptr >= self.M - 1 or self.live_ptr >= self.N - 1:
            return "stop"

        w = self._w
        while len(self.buf) >= self.fft_len:
            # batch-extract every currently available column in one device
            # call; buffer consumption then replays the reference's
            # one-col-per-iteration bookkeeping exactly
            n_cols = (len(self.buf) - self.fft_len) // self.hop_size + 1
            frames = np.lib.stride_tricks.sliding_window_view(
                np.asarray(self.buf, self.dtype), self.fft_len
            )[:: self.hop_size][:n_cols]
            cols = np.asarray(chroma_frames(jnp.asarray(frames)))  # (12, n_cols)

            for k in range(n_cols):
                self.buf = self.buf[self.hop_size:]
                if self.chroma_ptr >= self.N:
                    return "stop"  # live buffer capacity exhausted
                self.chroma_live[:, self.chroma_ptr] = cols[:, k]
                self.chroma_ptr += 1

                if self.ref_ptr >= (self.M - 1 - w) or self.live_ptr >= (self.N - 1 - w):
                    return "stop"

                while self.chroma_ptr - self.live_ptr >= w:
                    self._run_window()
        return None

    # ------------------------------------------------------------------
    def _run_window(self):
        """One w×w window DTW + subpath commit (wtw.py:100-128)."""
        w = self._w
        x = self.chroma_live[:, self.live_ptr : self.live_ptr + w]
        y = self.chroma_ref[:, self.ref_ptr : self.ref_ptr + w]
        acc, points, length = _window_dtw(x, y)
        self.acc_cost[
            self.live_ptr : self.live_ptr + w, self.ref_ptr : self.ref_ptr + w
        ] = np.asarray(acc)
        subpath = np.asarray(points)[: int(length)][::-1]  # origin → end

        next_start = self._hop_frames
        change = False
        index = None
        for i in range(len(subpath)):
            l, r = int(subpath[i][0]), int(subpath[i][1])
            if l <= next_start:
                self.path.append((l + self.live_ptr, r + self.ref_ptr))
            else:
                change = True
                index = i - 1
                break
        if change:
            self.live_ptr = int(subpath[index][0]) + self.live_ptr
            self.ref_ptr = int(subpath[index][1]) + self.ref_ptr
        else:
            # subpath never crossed the hop boundary: take the diagonal
            self.live_ptr = self.live_ptr + self._hop_frames
            self.ref_ptr = self.ref_ptr + self._hop_frames
