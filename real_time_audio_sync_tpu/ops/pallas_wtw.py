"""Fused Pallas kernel: streaming windowed time warping (WTW) with
persistent device state.

``AsyncWTW`` (models/wtw_async.py) already keeps the WTW engine state
device-resident, but its block step is an XLA program whose window DP is a
``lax.scan`` over 2w−1 anti-diagonals — each scan iteration pays the TPU's
per-loop-boundary overhead (~10-20 µs), which dwarfs the per-diagonal vector
work at w≈20 and leaves the WTW family an order of magnitude behind the
fused OTW engine (round-3 verdict: AsyncWTW 106× vs fused OTW 2014× at the
same scale).  This kernel is the WTW analog of ``ops/pallas_otw.py`` driver
2b: K hop columns per launch, with the column append, the due w×w window DP,
the in-kernel backtrack, the subpath commit and the pointer advance ALL
inside one Pallas program, and the engine state carried across launches via
``input_output_aliases``:

- **sliding live-chroma window** (VMEM, (l_pad, 128) transposed rows=time):
  the WTW recurrence only ever reads live rows [live_ptr, live_ptr+w), and
  live_ptr advances by exactly ``hop_frames`` per window (the one-window-
  per-column invariant proved in models/wtw_async.py), so O(w + k_block)
  rows suffice regardless of stream length.  A prologue shift realigns the
  window so physical row 0 is ``live_base = live_ptr`` (scalar slot carried
  across launches), exactly like the long-reference OTW kernel.
- **reference in HBM** (``pl.ANY``): a prologue DMA pulls the
  [ref_ptr, ref_ptr + r_win) row window into VMEM scratch — hour-long
  references (wtw.py:37-41 precomputes the full ref chromagram) cost O(w)
  VMEM instead of O(M).
- **window DP in natural layout**: the w×w cosine cost is one MXU
  ``dot_general`` (live rows × ref rows over the 128-lane feature axis,
  ``Precision.HIGHEST`` — exact f32), then 2w−1 anti-diagonal updates as
  masked whole-window VPU ops (roll + min-chain) writing acc/back scratch.
  Candidate order, weights and back codes follow WTW_SPEC (wtw.py:173-217:
  unweighted diagonal, up/left/diag first-min tie order, codes 3/1/2,
  corner 0) with the identical nb + cost f32 arithmetic as
  ops/wavefront.wavefront_dp, so DP decisions match the host engine (the
  12-term cost reductions can differ in the last ulp from XLA's matmul —
  empirically path-identical on real and synthetic audio, enforced by
  tests/test_pallas_wtw.py and the hardware suite).
- **backtrack + commit in-kernel**: a scalar pointer chase over the VMEM
  back matrix into SMEM temp buffers, then the reference's subpath-commit
  rule (points with l ≤ dtw_hop/hop committed, wtw.py:110-128) appends to
  per-launch SMEM **delta** buffers that the host accumulates in dispatch
  order (models/fused_wtw.py drains them through the shared delta
  machinery) — the full path never lives on-device.

Scalar state (SMEM int32[16], aliased): chroma_ptr, live_ptr, ref_ptr,
committed path length, flags (bit0 stop, bit1 delta overflow), live_base.
Stop semantics replicate models/wtw_async.py body_cols exactly (capacity
stop before increment, per-column margin guard, at most one due window per
appended column); committed paths are bit-equal to the host ``WTW`` engine
(tests/test_pallas_wtw.py: interpret-mode on CPU, non-interpret on hardware
via tests/test_tpu_hardware.py).

Reference behavior being reimplemented: /root/reference/wtw.py:71-130
(insert loop), 162-171 (cosine cost with norm division), 173-217 (window
DP), 219-240 (backtrack).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from real_time_audio_sync_tpu.ops.wavefront import WTW_SPEC, StepSpec

_LANES = 128
_SUBLANES = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _squeezed_batch_spec(shape_tail, mem):
    """BlockSpec for one stream's block of a batch-leading array in a 1-D
    grid over streams (see ops/pallas_otw.py — SMEM operands must arrive
    row-shaped (B, 1, X))."""
    zeros = (0,) * len(shape_tail)
    return pl.BlockSpec((None, *shape_tail), lambda i: (i, *zeros), memory_space=mem)


# scalar-state slots (SMEM int32[16]; mirrors models/wtw_async.py layout
# plus the sliding-window base)
(_WS_CHROMA, _WS_LIVE, _WS_REF, _WS_PLEN, _WS_FLAGS, _WS_BASE,
 _WS_LASTX, _WS_LASTY) = range(8)
_N_SCALARS = 16


def wtw_geometry(w: int, hop_frames: int, k_block: int):
    """Static window/buffer sizes shared by the kernel, the drivers and the
    engines' state allocation.

    Bounds: at most one window becomes due per appended column (wtw_async
    invariant), so ``n_w = 1 + ceil(k_block/hop_frames)`` windows per
    launch; live_ptr advances exactly ``hop_frames`` per window; ref_ptr at
    most ``max(w−1, hop_frames)`` per window — normally the last committed
    point's ref coordinate (≤ w−1), but the diagonal fallback (mirroring
    wtw.py:127-128) advances ref_ptr by ``hop_frames``, which exceeds w−1
    when WTWParams sets dtw_hop_size ≥ dtw_win_size (ADVICE r4 item 1: the
    DMA window must cover that advance or the in-kernel cost matmul reads
    past the r_win scratch).
    """
    w_pad = _round_up(w, _SUBLANES)
    n_w = 1 + -(-k_block // hop_frames)
    max_adv = n_w * hop_frames
    l_win = _round_up(w + k_block + max_adv + 16, _SUBLANES)
    l_pad = l_win + _round_up(max_adv + 8, _SUBLANES)
    # the cost matmul slices a fixed 128 ref rows (clean lane tiling; rows
    # ≥ w are masked), so the DMA window must cover 128 rows past the
    # largest in-launch ref_ptr
    r_win = _round_up(_LANES + n_w * max(w - 1, hop_frames) + 16, _SUBLANES)
    maxpts = 2 * w - 1
    d_pad = n_w * maxpts + 8
    return w_pad, l_win, l_pad, r_win, d_pad, maxpts


def _make_wtw_kernel(w: int, hop_frames: int, k_block: int, k_pad: int,
                     l_win: int, r_win: int, d_pad: int,
                     spec: StepSpec = WTW_SPEC, batched: bool = False,
                     shared_ref: bool = True):
    w_pad, _, _, _, _, maxpts = wtw_geometry(w, hop_frames, k_block)
    inf = np.float32(np.inf)

    def kernel(
        lens_ref,  # SMEM (4,): [m (ref frames), n_cap (2m), n_valid, 0]
        ref_hbm_ref,  # ANY/HBM ref^T (1|B, R_pad, 128), zero rows past m
        cols_ref,  # VMEM (k_pad, 128): incoming chroma columns, transposed
        eye_ref,  # VMEM (128, 128) identity (exact-transpose trick)
        live_in, sc_in,  # aliased state (inputs)
        live_ref, sc_ref,  # aliased state (outputs)
        status_ref,  # SMEM (8,) int32: [flags, plen, lastx, lasty]
        dx_ref, dy_ref,  # SMEM (d_pad,) int32: this launch's path delta
        ref_win,  # VMEM scratch: ref rows [ref_base, ref_base+r_win)
        cost_s,  # VMEM scratch (w_pad, 128) f32: window cost
        acc_s,  # VMEM scratch (w_pad, 128) f32: window acc
        back_s,  # VMEM scratch (w_pad, 128) i32: window back codes
        tx_s, ty_s,  # SMEM scratch (maxpts_pad,) i32: backtrack temp
        sem_ref,  # DMA semaphore
    ):
        if batched:
            ld = lambda r, i: r[0, i]

            def st(r, i, v):
                r[0, i] = v
        else:
            ld = lambda r, i: r[i]

            def st(r, i, v):
                r[i] = v

        for _s in range(_N_SCALARS):
            st(sc_ref, _s, ld(sc_in, _s))

        m = ld(lens_ref, 0)
        n_cap = ld(lens_ref, 1)
        n_valid = ld(lens_ref, 2)
        cp0 = ld(sc_ref, _WS_CHROMA)
        lp0 = ld(sc_ref, _WS_LIVE)
        rp0 = ld(sc_ref, _WS_REF)
        plen0 = ld(sc_ref, _WS_PLEN)
        fl0 = ld(sc_ref, _WS_FLAGS)
        old_base = ld(sc_ref, _WS_BASE)

        # ref window DMA first — overlaps with the live-window realign
        ref_base = rp0
        if batched:
            stream = 0 if shared_ref else pl.program_id(0)
            ref_src = ref_hbm_ref.at[pl.ds(stream, 1), pl.ds(ref_base, r_win)]
        else:
            ref_src = ref_hbm_ref.at[pl.ds(ref_base, r_win)]
        ref_dma = pltpu.make_async_copy(ref_src, ref_win, sem_ref)
        ref_dma.start()

        # live-window realign: physical row 0 ← virtual row live_ptr.  The
        # copy reads the INPUT buffer, so it doubles as the defensive
        # state carry when aliasing is not honored (see ops/pallas_otw.py
        # CAUTION); rows ≥ l_win are never read before being written
        # (every valid virtual row lands at physical < l_win by the
        # wtw_geometry bounds).
        new_base = jnp.maximum(old_base, lp0)
        delta = new_base - old_base
        live_ref[pl.ds(0, l_win), :] = live_in[pl.ds(delta, l_win), :]
        st(sc_ref, _WS_BASE, new_base)
        ref_dma.wait()
        ref_view = ref_win.at[0] if batched else ref_win

        row_iota = lax.broadcasted_iota(jnp.int32, (w_pad, 1), 0)
        lane_iota = lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

        def run_window(args):
            """One due w×w window: cost → DP → backtrack → subpath commit →
            pointer advance (wtw.py:100-128), entirely in-kernel."""
            lp, rp, plen, lastx, lasty, fl = args
            base_out = plen - plen0  # this window's delta-buffer offset

            # -- cosine cost with norm division (wtw.py:162-171) ----------
            x = live_ref[pl.ds(lp - new_base, w_pad), :]  # (w_pad, 128)
            y = ref_view[pl.ds(rp - ref_base, _LANES), :]  # (128, 128)
            dots = lax.dot_general(
                x, y, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,  # exact f32 MXU path
            )  # (w_pad, 128): dots[a, b] = live[lp+a] · ref[rp+b]
            nx = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))  # (w_pad, 1)
            ny_s = jnp.sqrt(jnp.sum(y * y, axis=1, keepdims=True))  # (128, 1)
            ny = lax.dot_general(  # exact (128,1) → (1,128) transpose
                ny_s, eye_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            cost_s[:] = 1.0 - dots / (nx * ny)

            # -- anti-diagonal DP over the natural layout ------------------
            # (identical candidate arithmetic/tie order to wavefront_dp;
            # rows/lanes ≥ w masked — they may hold garbage from window pad)
            acc_s[:] = jnp.full((w_pad, _LANES), inf, jnp.float32)
            back_s[:] = jnp.zeros((w_pad, _LANES), jnp.int32)

            def dstep(d, _):
                acc = acc_s[:]
                c = cost_s[:]
                up = jnp.where(row_iota == 0, inf, pltpu.roll(acc, 1, axis=0))
                left = jnp.where(lane_iota == 0, inf, pltpu.roll(acc, 1, axis=1))
                diag = jnp.where(lane_iota == 0, inf, pltpu.roll(up, 1, axis=1))
                nb_of = {(-1, 0): up, (0, -1): left, (-1, -1): diag}
                best = None
                code = None
                for (di, dj), wt, bc in zip(spec.steps, spec.weights, spec.codes):
                    nb = nb_of[(di, dj)]
                    if wt == 1.0:
                        cand = nb + c
                    elif wt == 2.0:
                        cand = nb + (c + c)
                    else:
                        cand = nb + np.float32(wt) * c
                    if best is None:
                        best, code = cand, jnp.full_like(back_s[:], bc)
                    else:
                        take = cand < best  # strict < ⇒ first-min tie order
                        best = jnp.where(take, cand, best)
                        code = jnp.where(take, bc, code)
                corner = (row_iota + lane_iota) == 0
                val = jnp.where(corner, c, best)
                code = jnp.where(corner, spec.corner_code, code)
                mask = ((row_iota + lane_iota == d)
                        & (row_iota < w) & (lane_iota < w))
                acc_s[:] = jnp.where(mask, val, acc)
                back_s[:] = jnp.where(mask, code, back_s[:])
                return 0

            lax.fori_loop(0, 2 * w - 1, dstep, 0)

            # -- backtrack (wtw.py:219-240): scalar chase, end → origin ----
            lane_row = lane_iota  # (1, 128)

            def btstep(s, carry):
                i, j, done, length, n_c = carry
                tx_s[s] = i
                ty_s[s] = j
                length = length + jnp.where(done, 0, 1)
                # committed prefix size: points with l ≤ hop_frames
                # (wtw.py:110-115; l is the live coordinate)
                n_c = n_c + jnp.where(~done & (i <= hop_frames), 1, 0)
                row = back_s[pl.ds(i, 1), :]
                code = jnp.sum(jnp.where(lane_row == j, row, 0))
                di = jnp.int32(0)
                dj = jnp.int32(0)
                for (sdi, sdj), scode in zip(spec.steps, spec.codes):
                    di = jnp.where(code == scode, jnp.int32(sdi), di)
                    dj = jnp.where(code == scode, jnp.int32(sdj), dj)
                now_done = done | ((i == 0) & (j == 0))
                i = jnp.where(now_done, i, i + di)
                j = jnp.where(now_done, j, j + dj)
                return i, j, now_done, length, n_c

            init = (jnp.int32(w - 1), jnp.int32(w - 1), jnp.bool_(False),
                    jnp.int32(0), jnp.int32(0))
            _, _, _, length, n_c = lax.fori_loop(0, maxpts, btstep, init)

            # -- subpath commit into the launch delta (wtw.py:110-119) -----
            # origin-order point q lives at temp index length-1-q; commit
            # the first n_c (all with l ≤ hop_frames; n_c ≥ 1 always — the
            # window origin (0, 0) qualifies)
            def cstep(q, fl2):
                commit = q < n_c
                idx = jnp.clip(length - 1 - q, 0, maxpts - 1)
                dest = base_out + q

                @pl.when(commit & (dest < d_pad))
                def _():
                    st(dx_ref, dest, tx_s[idx] + lp)
                    st(dy_ref, dest, ty_s[idx] + rp)

                return fl2 | jnp.where(commit & (dest >= d_pad), 2, 0)

            fl = lax.fori_loop(0, maxpts, cstep, fl)
            last_idx = jnp.clip(length - n_c, 0, maxpts - 1)
            lastx = tx_s[last_idx] + lp
            lasty = ty_s[last_idx] + rp
            plen = plen + n_c

            # -- pointer advance / diagonal fallback (wtw.py:120-128) ------
            change = n_c < length
            lp = lp + jnp.where(change, tx_s[last_idx], hop_frames)
            rp = rp + jnp.where(change, ty_s[last_idx], hop_frames)
            return lp, rp, plen, lastx, lasty, fl

        def col_step(k, carry):
            """One appended column, replicating models/wtw_async.py
            body_cols: append if room, capacity stop BEFORE increment,
            per-column margin guard, at most one due window."""
            cp, lp, rp, plen, fl, lastx, lasty = carry
            active = (k < n_valid) & ((fl & 1) == 0)
            can_append = active & (cp < n_cap)

            @pl.when(can_append)
            def _():
                live_ref[pl.ds(cp - new_base, 1), :] = cols_ref[pl.ds(k, 1), :]

            cap_stop = active & (cp >= n_cap)
            cp = cp + jnp.where(active & ~cap_stop, 1, 0)
            margin_stop = (rp >= m - 1 - w) | (lp >= n_cap - 1 - w)
            stop_now = cap_stop | (active & ~cap_stop & margin_stop)
            fl = fl | jnp.where(stop_now, 1, 0)

            due = active & ~stop_now & (cp - lp >= w)
            lp, rp, plen, lastx, lasty, fl = lax.cond(
                due, run_window, lambda a: a, (lp, rp, plen, lastx, lasty, fl)
            )
            return cp, lp, rp, plen, fl, lastx, lasty

        carry = (cp0, lp0, rp0, plen0, fl0,
                 ld(sc_ref, _WS_LASTX), ld(sc_ref, _WS_LASTY))
        cp, lp, rp, plen, fl, lastx, lasty = lax.fori_loop(
            0, k_block, col_step, carry)

        st(sc_ref, _WS_CHROMA, cp)
        st(sc_ref, _WS_LIVE, lp)
        st(sc_ref, _WS_REF, rp)
        st(sc_ref, _WS_PLEN, plen)
        st(sc_ref, _WS_FLAGS, fl)
        st(sc_ref, _WS_LASTX, lastx)
        st(sc_ref, _WS_LASTY, lasty)
        st(status_ref, 0, fl)
        st(status_ref, 1, plen)
        st(status_ref, 2, lastx)
        st(status_ref, 3, lasty)

    return kernel


@partial(jax.jit,
         static_argnames=("w", "hop_frames", "k_block", "interpret"),
         donate_argnames=("live_win", "scalars"))
def _pallas_wtw_insert_block(lens, ref_hbm, cols, live_win, scalars,
                             w: int, hop_frames: int, k_block: int,
                             interpret: bool = False):
    """K hop-column inserts for one stream in ONE launch.

    Returns ``(live_win', scalars', status, delta_x, delta_y)``; the caller
    accumulates per-launch path deltas host-side in dispatch order
    (``delta[: plen_end − plen_start]`` are the valid entries).
    """
    if cols.shape[-1] < _LANES:
        cols = jnp.pad(cols, ((0, 0), (0, _LANES - cols.shape[-1])))
    k_pad = cols.shape[0]
    w_pad, l_win, l_pad, r_win, d_pad, maxpts = wtw_geometry(w, hop_frames, k_block)
    assert live_win.shape == (l_pad, _LANES), live_win.shape
    kernel = _make_wtw_kernel(w, hop_frames, k_block, k_pad, l_win, r_win, d_pad)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    anym = pl.BlockSpec(memory_space=pl.ANY)
    mp_pad = _round_up(maxpts, _SUBLANES)
    return pl.pallas_call(
        kernel,
        in_specs=[smem, anym, vmem, vmem, vmem, smem],
        out_specs=(vmem, smem, smem, smem, smem),
        out_shape=(
            jax.ShapeDtypeStruct(live_win.shape, jnp.float32),
            jax.ShapeDtypeStruct(scalars.shape, jnp.int32),
            jax.ShapeDtypeStruct((8,), jnp.int32),
            jax.ShapeDtypeStruct((d_pad,), jnp.int32),
            jax.ShapeDtypeStruct((d_pad,), jnp.int32),
        ),
        # inputs (lens, ref, cols, eye, live, sc) → outputs (live', sc', ...)
        input_output_aliases={4: 0, 5: 1},
        scratch_shapes=[
            pltpu.VMEM((r_win, _LANES), jnp.float32),
            pltpu.VMEM((w_pad, _LANES), jnp.float32),
            pltpu.VMEM((w_pad, _LANES), jnp.float32),
            pltpu.VMEM((w_pad, _LANES), jnp.int32),
            pltpu.SMEM((mp_pad,), jnp.int32),
            pltpu.SMEM((mp_pad,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(lens, ref_hbm, cols, jnp.eye(_LANES, dtype=jnp.float32), live_win, scalars)


@partial(jax.jit,
         static_argnames=("w", "hop_frames", "k_block", "shared_ref", "interpret"),
         donate_argnames=("live_win", "scalars"))
def _pallas_multi_wtw_insert_block(lens, ref_hbm, cols, live_win, scalars,
                                   w: int, hop_frames: int, k_block: int,
                                   shared_ref: bool = True,
                                   interpret: bool = False):
    """B concurrent WTW streams per launch: a 1-D grid over streams running
    the solo kernel body per grid step (squeezed-batch BlockSpecs, the
    ops/pallas_otw.py driver-3 pattern).  Per-stream control flow (stop,
    due-window predication) runs divergently per grid step — the vmapped
    XLA engine must instead execute every branch for the whole batch.

    ``shared_ref=True``: all streams follow ONE reference ((1, R, 128) HBM
    array; each grid step DMAs its own [ref_ptr, +r_win) window from it) —
    the B-listeners-one-concert serving shape with reference HBM flat in B.

    Returns ``(live_win', scalars', status (B,1,8), dx (B,1,d_pad), dy)``.
    """
    b = live_win.shape[0]
    if cols.shape[-1] < _LANES:
        cols = jnp.pad(cols, ((0, 0), (0, 0), (0, _LANES - cols.shape[-1])))
    k_pad = cols.shape[1]
    w_pad, l_win, l_pad, r_win, d_pad, maxpts = wtw_geometry(w, hop_frames, k_block)
    assert live_win.shape == (b, l_pad, _LANES), live_win.shape
    kernel = _make_wtw_kernel(w, hop_frames, k_block, k_pad, l_win, r_win,
                              d_pad, batched=True, shared_ref=shared_ref)

    def _batched(arr, mem):
        return _squeezed_batch_spec(arr.shape[1:], mem)

    eye = jnp.eye(_LANES, dtype=jnp.float32)
    eye_spec = pl.BlockSpec(eye.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    vmem, smem = pltpu.VMEM, pltpu.SMEM
    mp_pad = _round_up(maxpts, _SUBLANES)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            _batched(lens, smem),
            pl.BlockSpec(memory_space=pl.ANY),  # whole ref array; DMA per step
            _batched(cols, vmem),
            eye_spec,
            _batched(live_win, vmem),
            _batched(scalars, smem),
        ],
        out_specs=(
            _batched(live_win, vmem),
            _batched(scalars, smem),
            pl.BlockSpec((None, 1, 8), lambda i: (i, 0, 0), memory_space=smem),
            pl.BlockSpec((None, 1, d_pad), lambda i: (i, 0, 0), memory_space=smem),
            pl.BlockSpec((None, 1, d_pad), lambda i: (i, 0, 0), memory_space=smem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(live_win.shape, jnp.float32),
            jax.ShapeDtypeStruct(scalars.shape, jnp.int32),
            jax.ShapeDtypeStruct((b, 1, 8), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, d_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, d_pad), jnp.int32),
        ),
        input_output_aliases={4: 0, 5: 1},
        scratch_shapes=[
            pltpu.VMEM((1, r_win, _LANES), jnp.float32),
            pltpu.VMEM((w_pad, _LANES), jnp.float32),
            pltpu.VMEM((w_pad, _LANES), jnp.float32),
            pltpu.VMEM((w_pad, _LANES), jnp.int32),
            pltpu.SMEM((mp_pad,), jnp.int32),
            pltpu.SMEM((mp_pad,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(lens, ref_hbm, cols, eye, live_win, scalars)


def pallas_wtw_supported(w: int, dtype=np.float32) -> bool:
    """The kernel targets f32 and windows that fit the 128-lane cost/DP
    layout (w ≤ 128 covers both reference regimes: w=20 offline, w=100
    live).  Platform gating mirrors pallas_wavefront_supported."""
    if np.dtype(dtype) != np.float32 or w > _LANES:
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform != "cpu"
