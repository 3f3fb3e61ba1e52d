"""FusedWTW — streaming windowed time warping on the persistent-state
Pallas kernel.

Same raw-audio surface as :class:`~real_time_audio_sync_tpu.models.
wtw_async.AsyncWTW` (reference wtw.py:21-130): buffer samples, process
``k_block`` hop columns per device dispatch, "stop" and score position
polled lazily from the 16-byte status vector.  The difference is the block
step: AsyncWTW runs an XLA program whose window DP is a 2w−1-iteration
``lax.scan`` (each iteration pays ~10-20 µs of TPU loop overhead); here the
whole block — frontend-extracted column appends, the due w×w window DP,
backtrack, subpath commit, pointer advance — executes inside ONE Pallas
kernel (ops/pallas_wtw.py) with the engine state carried across launches
via ``input_output_aliases``.  Device state is O(w + k_block) regardless of
stream or reference length: the live chromagram is a sliding VMEM window
and the reference streams from HBM, so hour-long references serve at the
same per-launch cost as the 35-second test pair.

Committed paths are identical to the host ``WTW`` engine and the oracle
(tests/test_pallas_wtw.py; hardware via tests/test_tpu_hardware.py); like
the other fused engines, only the *timing* of "stop" differs (lazy,
post-stop inserts are frozen no-ops in-kernel).

Feature numerics: the in-kernel cosine cost reduces the 128-lane feature
axis with ``Precision.HIGHEST`` MXU dots (exact f32), which can differ from
the XLA engines' matmul in the last ulp — empirically path-identical on
real and synthetic audio (same contract as the kernel docstring).
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from real_time_audio_sync_tpu.config import WTWParams
from real_time_audio_sync_tpu.features.chroma import (
    _chroma_frames_impl,
    chroma_from_samples,
    frame_span,
    frontend_constants,
)
from real_time_audio_sync_tpu.models.fused_streaming import (
    _DELTA_STACK,
    fold_delta_tail,
    iter_delta_rows,
)
from real_time_audio_sync_tpu.models.online_core import StatusPolling
from real_time_audio_sync_tpu.models.wtw import SampleFIFO, _check_ref_window
from real_time_audio_sync_tpu.models.wtw_async import build_span, host_chroma_block
from real_time_audio_sync_tpu.ops.pallas_wtw import (
    _LANES,
    _N_SCALARS,
    _WS_CHROMA,
    _WS_LIVE,
    _WS_PLEN,
    _WS_REF,
    _pallas_wtw_insert_block,
    _round_up,
    _SUBLANES,
    wtw_geometry,
)
from real_time_audio_sync_tpu.utils.wavio import load_wav


@partial(jax.jit,
         static_argnames=("w", "hop_frames", "k_block", "fft", "hop",
                          "transfer", "interpret"),
         donate_argnames=("live_win", "scalars"))
def _fused_wtw_step(lens, ref_hbm, payload, live_win, scalars,
                    win, dft_cos, dft_sin, fb_t,
                    w: int, hop_frames: int, k_block: int, fft: int, hop: int,
                    transfer: str, interpret: bool = False):
    """One dispatch: frontend (for raw-span transfers) + the fused kernel,
    in a single program — the payload crosses host→device once."""
    k_pad = _round_up(k_block, _SUBLANES)
    if transfer == "chroma":
        cols12 = payload  # (12, k_block) host-extracted columns
    else:
        samples = payload
        if transfer == "int16":
            samples = samples.astype(win.dtype) / np.float32(32768.0).astype(win.dtype)
        frames = frame_span(samples, k_block, fft, hop)
        cols12 = _chroma_frames_impl(frames, win, dft_cos, dft_sin, fb_t, True)
    cols = cols12.T.astype(jnp.float32)  # (k_block, f)
    cols = jnp.pad(cols, ((0, k_pad - cols.shape[0]), (0, 0)))
    return _pallas_wtw_insert_block(lens, ref_hbm, cols, live_win, scalars,
                                    w, hop_frames, k_block, interpret)


class FusedWTW(StatusPolling):
    """Raw-audio streaming WTW on the fused Pallas kernel.

    Constructor surface mirrors :class:`AsyncWTW` (reference wtw.py:21-69):
    ``k_block`` hop columns per launch, ``transfer_dtype`` in
    {"float32", "int16", "chroma"} with the same H2D-bytes/numerics
    trade-offs (see models/wtw_async.py).  f32 only (the kernel's dtype).
    """

    dtype = np.dtype(np.float32)

    def __init__(self, ref_recording, params, debug_params=None,
                 k_block: int = 8, transfer_dtype: str = "float32",
                 interpret: bool = False):
        self.params = WTWParams.from_any(params)
        self.debug_params = debug_params or {}
        self.k_block = int(k_block)
        self.interpret = bool(interpret)
        if transfer_dtype not in ("auto", "float32", "int16", "chroma"):
            raise ValueError(f"unknown transfer_dtype {transfer_dtype!r}")
        if transfer_dtype == "auto":
            from real_time_audio_sync_tpu.parallel.transfer import (
                resolve_transfer_mode,
            )

            transfer_dtype = resolve_transfer_mode(
                "auto", 1, self.k_block, self.params.fft_len,
                self.params.hop_size)
        self.transfer_dtype = transfer_dtype

        if isinstance(ref_recording, (str, bytes)):
            self.ref, self.fs = load_wav(ref_recording)
            assert self.fs == 22050
        else:  # raw 22.05 kHz sample array (parity with AsyncWTW)
            self.ref = np.asarray(ref_recording)
            self.fs = 22050

        self.fft_len = self.params.fft_len
        self.hop_size = self.params.hop_size
        self._w = self.params.dtw_win_size // self.hop_size
        self._hop_frames = self.params.dtw_hop_size // self.hop_size
        if self._w > _LANES:
            raise ValueError(
                f"window of {self._w} frames exceeds the fused kernel's "
                f"{_LANES}-lane layout; use AsyncWTW for larger windows")

        self.chroma_ref = chroma_from_samples(self.ref, dtype=self.dtype)
        self.M = self.chroma_ref.shape[1]
        _check_ref_window(self.M, self.params)
        self.N = 2 * self.M  # live capacity (wtw.py:52)
        f = self.chroma_ref.shape[0]

        w_pad, l_win, l_pad, r_win, d_pad, maxpts = wtw_geometry(
            self._w, self._hop_frames, self.k_block)
        ref_t = np.zeros((_round_up(self.M + r_win + 8, _SUBLANES), _LANES),
                         np.float32)
        ref_t[: self.M, :f] = self.chroma_ref.T
        self._ref_hbm = jax.device_put(jnp.asarray(ref_t))
        self._live_win = jax.device_put(jnp.zeros((l_pad, _LANES), jnp.float32))
        self._scalars = jax.device_put(jnp.zeros((_N_SCALARS,), jnp.int32))
        self._frontend_consts = frontend_constants(self.fft_len, self.fs,
                                                   np.float32)

        # per-launch path deltas pending host accumulation (the shared
        # fused-streaming delta machinery)
        self._deltas: list = []
        self._host_px: list = []
        self._host_py: list = []
        self._drained_plen = 0

        self.buf = SampleFIFO(self.dtype)
        self._init_status_polling()

    # ------------------------------------------------------------------
    def _avail_cols(self) -> int:
        n = len(self.buf)
        return 0 if n < self.fft_len else (n - self.fft_len) // self.hop_size + 1

    def _dispatch(self, k: int) -> None:
        if self.transfer_dtype == "chroma":
            payload = np.ascontiguousarray(host_chroma_block(
                self.buf, k, self.k_block, self.hop_size, self.fft_len,
                self.dtype))
        else:
            payload = build_span(self.buf, k, self.k_block, self.hop_size,
                                 self.fft_len, self.dtype)
            if self.transfer_dtype == "int16":
                payload = np.clip(np.round(payload * 32768.0), -32768,
                                  32767).astype(np.int16)
        lens = np.asarray([self.M, self.N, k, 0], np.int32)
        self._live_win, self._scalars, status, dx, dy = _fused_wtw_step(
            lens, self._ref_hbm, payload, self._live_win, self._scalars,
            *self._frontend_consts,
            w=self._w, hop_frames=self._hop_frames, k_block=self.k_block,
            fft=self.fft_len, hop=self.hop_size,
            transfer=self.transfer_dtype, interpret=self.interpret,
        )
        self._deltas.append((status, dx, dy))
        fold_delta_tail(self._deltas, _DELTA_STACK)
        self._swap_status(status, k)

    def insert(self, live_audio_buf):
        """Insert raw audio samples; non-blocking, lazy "stop" (wtw.py:71)."""
        self.buf.extend(live_audio_buf)
        if self._stopped_cached or self.poll() == "stop":
            return "stop"
        while self._avail_cols() >= self.k_block:
            self._dispatch(self.k_block)
        return None

    insert_nowait = insert

    def flush(self):
        """Drain whole remaining hop columns and wait for all in-flight
        launches; returns ``"stop"`` or None."""
        k = self._avail_cols()
        if k > 0 and not self._stopped_cached:
            self._dispatch(k)
        return self.poll(block=True)

    _overflow_msg = "FusedWTW per-launch path delta overflow"

    # -- inspection (each synchronizes) ---------------------------------
    def _drain_deltas(self) -> None:
        for rows in iter_delta_rows(self._deltas):
            d_pad = (rows.shape[-1] - 8) // 2
            for row in rows:
                plen_end = int(row[1])
                n_new = plen_end - self._drained_plen
                if n_new > 0:
                    self._host_px.append(row[8 : 8 + n_new].astype(np.int32))
                    self._host_py.append(
                        row[8 + d_pad : 8 + d_pad + n_new].astype(np.int32))
                    self._drained_plen = plen_end

    @property
    def path_array(self) -> np.ndarray:
        self._drain_deltas()
        if not self._host_px:
            return np.zeros((0, 2), np.int32)
        return np.stack(
            [np.concatenate(self._host_px), np.concatenate(self._host_py)],
            axis=1)

    @property
    def path(self) -> List[tuple]:
        return [tuple(p) for p in self.path_array]

    @property
    def pointers(self):
        """(chroma_ptr, live_ptr, ref_ptr) — synchronizing host read."""
        sc = np.asarray(self._scalars)
        return int(sc[_WS_CHROMA]), int(sc[_WS_LIVE]), int(sc[_WS_REF])
