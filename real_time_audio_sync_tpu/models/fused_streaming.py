"""Fused-kernel streaming engine: Pallas inserts with persistent VMEM state.

The XLA streaming path (models/online_core.BandedOnlineEngine) dispatches
one program per frame/block whose scan steps each issue ~30 HLO ops; this
engine instead drives ``ops.pallas_otw._pallas_insert_block`` — K streaming
inserts per launch executed inside one kernel (~8 µs per alignment step),
with the complete engine state (the band-relative window, the transposed
live-feature buffer, the committed path and the scalar pointers) carried
ACROSS launches via ``input_output_aliases`` — nothing is rebuilt or
re-transferred between hops.

API mirrors the pipelined subset of ``BandedOnlineEngine``:
``insert_block_nowait`` / ``poll`` / ``flush`` / ``.path`` / ``.last_point``,
with "stop" semantics identical to the reference (otw_eran.py:69-71; frozen
no-op inserts after stop, lazy detection via the status vector).  Committed
paths are exactly those of the XLA engine (tests/test_fused_streaming.py,
hardware-verified in tests/test_tpu_hardware.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from real_time_audio_sync_tpu.config import OTWParams
from real_time_audio_sync_tpu.models.online_core import (
    BOTH,
    ENGINE_OVERRIDES,
    PREV_NONE,
    OnlineConfig,
    StatusPolling,
)
from real_time_audio_sync_tpu.ops.pallas_otw import (
    _LANES,
    _N_SCALARS,
    _S_DIR,
    _S_FIRST,
    _S_PLEN,
    _S_RC,
    _S_PREV,
    _S_LASTX,
    _S_LASTY,
    _long_geometry,
    _pallas_insert_block,
    _pallas_insert_block_long,
    _round_up,
    _SUBLANES,
)

# references longer than this stream through the long-reference kernel by
# default: the standard kernel's whole-sequence VMEM buffers (ref (c+N)·512 B
# + live (c+2N)·512 B) approach the ~16 MB VMEM budget near N ≈ 7.5k frames
_LONG_REF_THRESHOLD = 6000
# pending path-delta launches are folded into one device-side stack at this
# size, so draining costs one relay read per _DELTA_STACK launches
_DELTA_STACK = 64


def fold_delta_tail(deltas: list, stack: int) -> None:
    """Fold the trailing run of unstacked (status, dx, dy) triples in
    ``deltas`` into ONE device-side array once ``stack`` have accumulated —
    an async dispatch, never a read.  Each component may carry extra leading
    batch dims (the multi-stream engine's (B, 1, X) rows); the fold stacks
    a new launch axis in front and concatenates [status | dx | dy] along the
    last axis.  Shared by the solo and multi-stream long engines so the
    layout stays defined in exactly one place."""
    tail = [d for d in deltas[-stack:] if isinstance(d, tuple)]
    if len(deltas) < stack or len(tail) < stack:
        return
    sts = jnp.stack([t[0] for t in tail])
    dxs = jnp.stack([t[1] for t in tail])
    dys = jnp.stack([t[2] for t in tail])
    stacked = jnp.concatenate([sts, dxs, dys], axis=-1)
    del deltas[len(deltas) - len(tail):]
    deltas.append(stacked)


def iter_delta_rows(deltas: list):
    """Yield each pending entry as a launch-major ``(M, ..., 8 + 2·d_pad)``
    numpy block in dispatch order (blocks on in-flight launches), then clear
    the list.  The inverse of :func:`fold_delta_tail`'s layout."""
    for entry in deltas:
        if isinstance(entry, tuple):
            yield np.concatenate([np.asarray(a) for a in entry], axis=-1)[None]
        else:
            yield np.asarray(entry)
    deltas.clear()


class FusedStreamingEngine(StatusPolling):
    """Streams chroma columns through the fused Pallas insert kernel."""

    dtype = np.dtype(np.float32)  # the kernel is f32-only

    def __init__(self, ref, params, cfg_overrides: Optional[dict] = None, k_block: int = 8, interpret: bool = False, long_ref: Optional[bool] = None):
        # interpret=True: Pallas interpreter mode (CPU parity tests) — the
        # interpreter does not alias the in/out state buffers, so the kernel
        # carries state across with explicit copies there
        self.interpret = bool(interpret)
        p = OTWParams.from_any(params)
        over = dict(ENGINE_OVERRIDES["otw"])
        over.update(cfg_overrides or {})
        self.cfg = OnlineConfig(c=p.c, max_run_count=p.max_run_count, **over)
        self.k_block = int(k_block)

        ref = np.asarray(ref, np.float32)
        f, n = ref.shape
        c = self.cfg.c
        if n < c:
            raise ValueError(f"reference length {n} shorter than search band {c}")
        if f > _LANES:
            raise ValueError(f"feature dim {f} exceeds the {_LANES}-lane layout")
        self.f, self.n = f, n
        self.cap = 2 * n  # pre-allocated live capacity (otw_eran.py:14)

        w_lane = _round_up(c + 1, _LANES)
        w_sub = _round_up(c + 1, _SUBLANES)
        self._w_shape = (w_sub, w_lane)

        # long-reference mode (ops/pallas_otw.py Driver 2b): hour-scale
        # references with O(c) VMEM — ref streamed from HBM, live history a
        # sliding window, path committed through per-launch delta buffers
        # accumulated host-side
        self.long_ref = bool(n >= _LONG_REF_THRESHOLD if long_ref is None else long_ref)

        scalars = np.zeros(_N_SCALARS, np.int32)
        scalars[_S_RC] = self.cfg.run_count_init
        scalars[_S_PREV] = PREV_NONE
        scalars[_S_LASTX] = -1
        scalars[_S_LASTY] = -1
        scalars[_S_FIRST] = 1
        scalars[_S_DIR] = BOTH

        if self.long_ref:
            l_win, l_pad, r_win, _ = _long_geometry(self.cfg, c, w_lane, self.k_block)
            ref_t = np.zeros((_round_up(c + n + r_win + 8, _SUBLANES), _LANES), np.float32)
            ref_t[c : c + n, :f] = ref.T
            self.ref_t = jax.device_put(jnp.asarray(ref_t))
            self._state = jax.device_put(
                (
                    jnp.full(self._w_shape, self.cfg.sentinel, jnp.float32),
                    jnp.zeros((l_pad, _LANES), jnp.float32),  # live window
                    jnp.asarray(scalars),
                )
            )
            # per-launch path deltas pending host accumulation: entries are
            # either (status, dx, dy) handles or one stacked
            # (M, 8 + 2·d_pad) array folding M launches (_DELTA_STACK)
            self._deltas: list = []
            self._host_px: list = []  # drained path (host, append-only)
            self._host_py: list = []
            self._drained_plen = 0
        else:
            ref_t = np.zeros((_round_up(c + n + w_lane + 8, _SUBLANES), _LANES), np.float32)
            ref_t[c : c + n, :f] = ref.T
            self.ref_t = jax.device_put(jnp.asarray(ref_t))

            p_pad = _round_up(self.cap + n + 16, _LANES)
            self._state = jax.device_put(
                (
                    jnp.full(self._w_shape, self.cfg.sentinel, jnp.float32),  # window
                    jnp.zeros((_round_up(c + self.cap + w_sub + 8, _SUBLANES), _LANES), jnp.float32),
                    jnp.zeros((p_pad,), jnp.int32),  # path x
                    jnp.zeros((p_pad,), jnp.int32),  # path y
                    jnp.asarray(scalars),
                )
            )
        self._init_status_polling()  # shared lazy status-vector machinery
        # adaptive per-frame coalescing (see feed()): frames held only while
        # the pipeline is saturated, never waiting for future input
        self._pending: list = []
        self.max_in_flight = 4
        self.dispatched_block_sizes: list = []  # diagnostics (coalescing histogram)

    def seed_origin_point(self) -> None:
        """Pre-commit the (0, 0) best point that set_live appends right
        after the origin eval, BEFORE the first row/column step
        (otw_eran.py:103-107) — the one place the batch-mode path differs
        from frame-by-frame insert.  Seeds plen/last_x/last_y so the V2
        monotone guard sees set_live's exact post-(0,0) state (run_count is
        recomputed by the first set_direction either way).  Owns the state
        layout so callers (ops.pallas_otw's long-pair set_live delegation)
        never reach into engine internals.  Fresh engines only."""
        if self._frames_dispatched or self._pending:
            raise RuntimeError("seed_origin_point requires a fresh engine")
        sc0 = np.asarray(self._state[-1]).copy()
        sc0[_S_PLEN] = 1
        sc0[_S_LASTX] = 0
        sc0[_S_LASTY] = 0
        sc_dev = jax.device_put(jnp.asarray(sc0))
        if self.long_ref:
            self._state = (*self._state[:2], sc_dev)
            self._host_px = [np.asarray([0], np.int32)]
            self._host_py = [np.asarray([0], np.int32)]
            self._drained_plen = 1
        else:
            # path_x/path_y are zero-initialized, so slot 0 already reads
            # (0, 0) — only the scalars need the committed length
            self._state = (*self._state[:4], sc_dev)

    # -- pipelined streaming API (mirrors BandedOnlineEngine) ----------------

    def insert_block_nowait(self, cols):
        """Dispatch up to k_block chroma columns (F, K); returns "stop" once
        a previously polled status showed it (lazy; post-stop inserts are
        frozen no-ops in-kernel, so the committed path is unaffected)."""
        if self._stopped_cached or self.poll() == "stop":
            return "stop"
        # frames queued by feed() must dispatch FIRST — mixing the two APIs
        # under a saturated pipeline must not reorder the stream
        pend = self._pending
        while pend and not self._stopped_cached:
            k = min(len(pend), self.k_block)
            self._dispatch_cols(np.stack(pend[:k], axis=1))
            del pend[:k]
        cols = np.asarray(cols, np.float32)
        if cols.ndim == 1:
            cols = cols[:, None]
        k = cols.shape[1]
        if k > self.k_block:  # oversize blocks split into k_block launches
            for s in range(0, k, self.k_block):
                if self.insert_block_nowait(cols[:, s : s + self.k_block]) == "stop":
                    return "stop"
            return None
        self._dispatch_cols(cols)
        return None

    insert_nowait = insert_block_nowait  # a single column is a K=1 block

    def _dispatch_cols(self, cols) -> None:
        """Launch one kernel over a (F, k<=k_block) column block (padded to
        the compiled k_block shape; the kernel masks by n_valid)."""
        k = cols.shape[1]
        # narrow host block (padded to 128 lanes on-device): H2D bytes are a
        # per-dispatch cost on relay-attached TPUs
        block = np.zeros((_round_up(self.k_block, _SUBLANES), _round_up(self.f, _SUBLANES)), np.float32)
        block[:k, : self.f] = cols.T
        lens = np.asarray([self.cap, self.n, k, 0], np.int32)
        if self.long_ref:
            w, live_win, sc = self._state
            w, live_win, sc, status, dx, dy = _pallas_insert_block_long(
                lens, self.ref_t, block, w, live_win, sc, self.cfg, self.k_block,
                interpret=self.interpret,
            )
            self._state = (w, live_win, sc)
            self._deltas.append((status, dx, dy))
            self._fold_deltas()
        else:
            w, live_t, px, py, sc = self._state
            *self._state, status = _pallas_insert_block(
                lens, self.ref_t, block, w, live_t, px, py, sc, self.cfg, self.k_block,
                interpret=self.interpret,
            )
            self._state = tuple(self._state)
        self._swap_status(status, k)

    # -- long-reference path-delta machinery ---------------------------------

    def _fold_deltas(self) -> None:
        fold_delta_tail(self._deltas, _DELTA_STACK)

    def _drain_deltas(self) -> None:
        """Accumulate every pending launch's committed path points into the
        host-side path (blocks on in-flight launches)."""
        for rows in iter_delta_rows(self._deltas):
            d_pad = (rows.shape[-1] - 8) // 2
            for row in rows:
                plen_end = int(row[1])
                n_new = plen_end - self._drained_plen
                if n_new > 0:
                    self._host_px.append(row[8 : 8 + n_new].astype(np.int32))
                    self._host_py.append(row[8 + d_pad : 8 + d_pad + n_new].astype(np.int32))
                    self._drained_plen = plen_end

    # -- adaptive per-frame streaming ----------------------------------------

    def feed(self, col):
        """Insert ONE chroma column with adaptive dispatch coalescing — the
        per-frame (hop-by-hop) production entry point.

        The column is dispatched immediately whenever the dispatch pipeline
        has room (fewer than ``max_in_flight`` unfinished launches — probed
        with free local ``is_ready`` checks, never a device read), so at
        real-time pacing every frame launches the moment it arrives, exactly
        like ``insert_nowait``.  Only when the relay/device pipeline is
        saturated do arriving frames coalesce into one multi-column launch
        (up to the compiled ``k_block``), which amortizes the ~0.2-0.4 ms
        per-dispatch relay floor across frames WITHOUT ever waiting for
        audio that has not arrived — added latency is bounded by the
        in-flight launches already executing, never by input buffering.

        Committed paths are identical to frame-by-frame ``insert`` (a k-
        column block is semantically k successive inserts; tested).  Returns
        ``"stop"`` lazily like :meth:`insert_block_nowait`.
        """
        if self._stopped_cached or self.poll() == "stop":
            return "stop"
        # np.array (not asarray): the column can stay QUEUED past this call
        # under saturation, so a zero-copy view of the caller's buffer would
        # be mutated before dispatch if the caller reuses it per hop
        col = np.array(col, np.float32).reshape(-1)
        self._pending.append(col)
        self._drain_pending()
        return None

    def _drain_pending(self) -> None:
        pend = self._pending
        while pend:
            # liveness safeguard: if completion flags lag (they resolve
            # asynchronously), an over-full pending queue dispatches anyway
            if self.in_flight() >= self.max_in_flight and len(pend) < 4 * self.k_block:
                break
            k = min(len(pend), self.k_block)
            self.dispatched_block_sizes.append(k)
            self._dispatch_cols(np.stack(pend[:k], axis=1))
            del pend[:k]

    def flush(self):
        """Dispatch any coalesce-pending frames, then wait for all in-flight
        launches; returns ``"stop"`` or None."""
        pend = self._pending
        while pend and not self._stopped_cached:
            k = min(len(pend), self.k_block)
            self._dispatch_cols(np.stack(pend[:k], axis=1))
            del pend[:k]
        pend.clear()  # post-stop remainder is semantically a frozen no-op
        return StatusPolling.flush(self)

    @property
    def path_array(self):
        if self.long_ref:
            self._drain_deltas()
            if not self._host_px:
                return np.zeros((0, 2), np.int32)
            return np.stack(
                [np.concatenate(self._host_px), np.concatenate(self._host_py)],
                axis=1,
            )
        px, py, sc = jax.device_get((self._state[2], self._state[3], self._state[4]))
        plen = int(sc[_S_PLEN])
        return np.stack([px[:plen], py[:plen]], axis=1)

    @property
    def path(self):
        return [tuple(p) for p in self.path_array]
