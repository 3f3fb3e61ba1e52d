"""Fused Pallas kernel: the entire online-time-warping alignment in ONE
kernel launch.

The XLA engine (models/online_core.py) runs the Dixon recurrence as a
lax.scan whose every step issues ~30 small HLO ops (~100 µs/step of per-op
overhead on TPU).  This kernel keeps the complete engine state in VMEM and
executes the whole set_live loop inside a single ``fori_loop``:

- **banded sliding-window state** (SURVEY.md §7 "ring buffers of band width
  c"): only rows ``[t−c, t]`` of the accumulated-cost matrix are ever read
  again (row updates read row t−1; column updates and band argmins read rows
  ≥ t−c), so the state is a (c+1, N) window shifted up one row per live
  frame — O(c·N) VMEM for arbitrarily long pieces instead of O(N²) HBM.
- band updates as full-row / single-column vector ops; columns are addressed
  with dynamic lane rotations (Mosaic requires static or 128-aligned lane
  offsets, so windows are rotated to lane 0 instead of sliced);
- the within-band min-plus chain as a Hillis–Steele doubling scan
  (log₂ vector steps);
- band argmins as min + first-match (argmax of equality), which preserves
  the reference's first-min tie order even when computed cells equal the
  uncomputed-cell sentinel;
- direction logic, run-count and path commits as scalar carries, with path
  points stored to SMEM.

Semantics match ``set_live_scan`` (otw_eran.py:91-142 / livenote.py:102-149);
parity is enforced by tests against both the XLA engine and the oracle.  The
dense ``acc_cost`` matrix is not materialized in this backend.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from real_time_audio_sync_tpu.models.online_core import BOTH, COL, PREV_NONE, ROW, OnlineConfig

_LANES = 128
_SUBLANES = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _minplus_doubling(b, cost, length: int, axis: int, use_roll: bool = True):
    """Hillis–Steele inclusive scan of ``r_k = min(b_k, r_{k-1} + c_k)``
    along ``axis`` (static ``length``).

    Shifts use the native TPU rotate (static shift) with an iota mask —
    concatenation-based shifts trigger Mosaic relayouts.
    """
    inf = np.float32(np.inf)
    zero = np.float32(0.0)

    if use_roll:
        iota = lax.broadcasted_iota(jnp.int32, b.shape, axis)

        def shifted(x, n, fill):
            return jnp.where(iota < n, fill, pltpu.roll(x, n, axis=axis))

    else:

        def shifted(x, n, fill):
            pad_shape = list(x.shape)
            pad_shape[axis] = n
            keep = [slice(None)] * x.ndim
            keep[axis] = slice(0, x.shape[axis] - n)
            return jnp.concatenate([jnp.full(pad_shape, fill, x.dtype), x[tuple(keep)]], axis=axis)

    r = b
    csum = cost
    shift = 1
    while shift < length:
        r = jnp.minimum(r, shifted(r, shift, inf) + csum)
        csum = shifted(csum, shift, zero) + csum
        shift *= 2
    return r


def _first_min(vals, valid, iota):
    """(min value, index of the FIRST valid minimum) — exact
    ``np.argmin``-over-band semantics even when excluded positions tie."""
    inf = np.float32(np.inf)
    masked = jnp.where(valid, vals, inf)
    m = jnp.min(masked)
    hit = valid & (vals == m)
    # first True wins: maximize hit * (BIG - index); float32 score because
    # Mosaic only lowers argmax for f32 (indices < 2^24 are exact)
    score = hit.astype(jnp.float32) * (np.int32(1 << 24) - iota).astype(jnp.float32)
    k = jnp.argmax(score)
    return m, k.astype(jnp.int32)


def _make_kernel(cfg: OnlineConfig, c: int, n_pad: int, live_pad_w: int, n_steps: int):
    sentinel = np.float32(cfg.sentinel)
    inf = np.float32(np.inf)

    def kernel(
        lens_ref,  # SMEM (2,): [live_len, ref_len]
        ref_ref,  # VMEM (f_pad, n_pad)
        live_ref,  # VMEM (f_pad, live_pad_w) — c leading zero columns
        path_x_ref,  # SMEM (p_pad,) int32
        path_y_ref,  # SMEM (p_pad,) int32
        out_scalars_ref,  # SMEM (8,) int32: plen, t, j, stopped
        acc_ref,  # VMEM scratch (c + 1, n_pad): absolute rows [t-c, t]
    ):
        live_len = lens_ref[0]
        ref_len = lens_ref[1]
        live_cap = 2 * ref_len  # pre-allocated live capacity (otw_eran.py:14)

        acc_ref[:] = jnp.full_like(acc_ref, sentinel)

        lane_iota = lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
        row_iota1 = lax.broadcasted_iota(jnp.int32, (c, 1), 0)  # window rows 1..c

        def ref_col(j):
            return pltpu.roll(ref_ref[:], n_pad - j, axis=1)[:, 0:1]  # (f_pad, 1)

        def live_col(t):
            # absolute live column t lives at padded column t + c
            return pltpu.roll(live_ref[:], live_pad_w - (t + c), axis=1)[:, 0:1]

        def acc_col(j):
            """(c+1, 1): column j of the window, all rows."""
            return pltpu.roll(acc_ref[:], n_pad - j, axis=1)[:, 0:1]

        def acc_two_cols(j):
            """(c+1, 2): columns j-1 and j from a single rotation."""
            return pltpu.roll(acc_ref[:], n_pad - (j - 1), axis=1)[:, 0:2]

        def cost_row_at(t):
            lv = live_col(t)
            if cfg.euclidean:
                d = ref_ref[:] - lv
                return jnp.sqrt(jnp.sum(d * d, axis=0, keepdims=True))
            return 1.0 - jnp.sum(lv * ref_ref[:], axis=0, keepdims=True)

        def cost_col_at(t, j):
            """(c, 1) cost of live rows [t-c+1..t] vs ref column j; result
            row k ↔ absolute live frame t-c+1+k (padded col t+1+k)."""
            rf = ref_col(j)  # (f_pad, 1)
            if cfg.euclidean:
                d = live_ref[:] - rf
                costs = jnp.sqrt(jnp.sum(d * d, axis=0, keepdims=True))  # (1, W)
            else:
                costs = 1.0 - jnp.sum(live_ref[:] * rf, axis=0, keepdims=True)
            # rotate so padded col t+1 lands at lane 0, then lanes → rows
            win = pltpu.roll(costs, live_pad_w - (t + 1), axis=1)[:, :c]  # (1, c)
            return win.reshape(c, 1)

        def append_point(x, y, plen, lastx, lasty):
            if cfg.monotone_path:
                ok = (plen == 0) | ((x > lastx) & (y >= lasty))
            else:
                ok = jnp.bool_(True)

            @pl.when(ok)
            def _():
                path_x_ref[plen] = x.astype(jnp.int32)
                path_y_ref[plen] = y.astype(jnp.int32)

            plen = plen + ok.astype(jnp.int32)
            lastx = jnp.where(ok, x, lastx)
            lasty = jnp.where(ok, y, lasty)
            return plen, lastx, lasty

        def best_point(t, j):
            # row band over the full row: valid lanes [max(0,j-c+1) .. j]
            sj = jnp.maximum(j - (c - 1), 0)
            row = acc_ref[c : c + 1, :]
            valid = (lane_iota >= sj) & (lane_iota <= j)
            cost_j, best_j = _first_min(row, valid, lane_iota)

            # column band: window rows 1..c ↔ absolute rows [t-c+1 .. t]
            colw = acc_col(j)[1 : c + 1]  # (c, 1)
            cvalid = (row_iota1 + (t - (c - 1))) >= 0
            cost_t, best_k = _first_min(colw, cvalid, row_iota1)
            best_t = t - (c - 1) + best_k

            use_row = cost_j < cost_t
            return (
                jnp.where(use_row, t, best_t).astype(jnp.int32),
                jnp.where(use_row, best_j, j).astype(jnp.int32),
            )

        def set_direction(t, j, rc, prev, plen, lastx, lasty):
            x, y = best_point(t, j)
            plen, lastx, lasty = append_point(x, y, plen, lastx, lasty)
            startup = t < c
            forced = rc >= cfg.max_run_count
            forced_dir = jnp.where(prev == ROW, COL, ROW)
            free_dir = jnp.where(x < t, COL, jnp.where(y < j, ROW, BOTH))
            d = jnp.where(startup, BOTH, jnp.where(forced, forced_dir, free_dir)).astype(jnp.int32)
            rc = jnp.where(d == prev, rc + 1, 1).astype(jnp.int32)
            prev = jnp.where(d != BOTH, d, prev).astype(jnp.int32)
            return d, rc, prev, plen, lastx, lasty

        def row_update(t, j):
            """Shift the window up one row, evaluate the row band at the new
            live frame t (otw_eran.py:58-62) as a full-row masked chain."""
            shifted = acc_ref[pl.ds(1, c), :]
            acc_ref[pl.ds(0, c), :] = shifted

            cost = cost_row_at(t)  # (1, n_pad)
            up = acc_ref[c - 1 : c, :]
            diag = pltpu.roll(up, 1, axis=1)
            diag = jnp.where(lane_iota == 0, inf, diag)
            b = jnp.minimum(up + cost, diag + 2.0 * cost)

            sj = jnp.maximum(j - (c - 1), 0)
            band = (lane_iota >= sj) & (lane_iota <= j)
            b_m = jnp.where(band, b, inf)
            c_m = jnp.where(band, cost, inf)
            # left neighbour of cell (t, sj): the uncomputed sentinel when
            # sj>0, no left step at all when sj==0
            r_init = jnp.where(sj > 0, sentinel, inf)
            b_m = jnp.where(lane_iota == sj, jnp.minimum(b_m, r_init + c_m), b_m)
            chain = _minplus_doubling(b_m, c_m, n_pad, axis=1)
            acc_ref[pl.ds(c, 1), :] = jnp.where(
                band, chain, jnp.full((1, n_pad), sentinel, jnp.float32)
            )

        def col_update(t, j):
            """Evaluate the column band [max(0,t-c+1)..t] at the fresh column
            j (otw_eran.py:73-77); window rows 1..c, chained down the rows."""
            cost = cost_col_at(t, j)  # (c, 1), row k ↔ abs row t-c+1+k
            two = acc_two_cols(j)  # (c+1, 2): lane 0 = col j-1, lane 1 = col j
            colj1 = two[:, 0:1]
            left = colj1[1 : c + 1]
            diag = colj1[0:c]
            abs_row = row_iota1 + (t - (c - 1))
            diag = jnp.where(abs_row == 0, inf, diag)  # row 0 has no diagonal
            b = jnp.minimum(left + cost, diag + 2.0 * cost)

            valid = abs_row >= 0
            b = jnp.where(valid, b, inf)
            cost_m = jnp.where(valid, cost, inf)
            # 'up' neighbour of the band's first cell: acc[t-c, j] when the
            # band is unclamped (t >= c), nothing otherwise
            up_boundary = two[0, 1]
            r_init = jnp.where(t >= c, up_boundary, inf)
            first_valid = abs_row == jnp.maximum(t - (c - 1), 0)
            b = jnp.where(first_valid, jnp.minimum(b, r_init + cost_m), b)
            chain = _minplus_doubling(b, cost_m, c, axis=0)

            # masked full-width write of window rows 1..c at lane j
            old = acc_ref[pl.ds(1, c), :]
            lane_j = lane_iota == j  # (1, n_pad)
            acc_ref[pl.ds(1, c), :] = jnp.where(lane_j & valid, chain, old)

        # --- initial condition: eval (0, 0) (otw_eran.py:100)
        lv0 = live_col(jnp.int32(0))
        rf0 = ref_ref[:, 0:1]
        if cfg.euclidean:
            c00 = jnp.sqrt(jnp.sum((lv0 - rf0) * (lv0 - rf0)))
        else:
            c00 = 1.0 - jnp.sum(lv0 * rf0)
        first_row = jnp.full((1, n_pad), sentinel, jnp.float32)
        acc_ref[pl.ds(c, 1), :] = jnp.where(lane_iota == 0, c00, first_row)

        def step(_, carry):
            t, j, rc, prev, plen, lastx, lasty, done = carry

            def body(args):
                t, j, rc, prev, plen, lastx, lasty = args
                d, rc, prev, plen, lastx, lasty = set_direction(t, j, rc, prev, plen, lastx, lasty)

                # row step
                do_row = d != COL
                t_new = jnp.where(do_row, t + 1, t)
                row_done = do_row & ((t_new >= live_len) | (t_new >= live_cap))

                @pl.when(do_row & ~row_done)
                def _():
                    row_update(t_new, j)

                done2 = row_done

                # column step (skipped when the row step broke out)
                do_col = (d != ROW) & ~done2
                j_new = jnp.where(do_col, j + 1, j)
                col_done = do_col & (j_new >= ref_len)

                @pl.when(do_col & ~col_done)
                def _():
                    col_update(t_new, j_new)

                done2 = done2 | col_done
                return t_new, j_new, rc, prev, plen, lastx, lasty, done2

            def skip(args):
                t, j, rc, prev, plen, lastx, lasty = args
                return t, j, rc, prev, plen, lastx, lasty, jnp.bool_(True)

            return lax.cond(done, skip, body, (t, j, rc, prev, plen, lastx, lasty))

        init = (
            jnp.int32(0),  # t
            jnp.int32(0),  # j
            jnp.int32(cfg.run_count_init),
            jnp.int32(PREV_NONE),
            jnp.int32(0),  # plen
            jnp.int32(-1),  # lastx
            jnp.int32(-1),  # lasty
            jnp.bool_(False),
        )
        t, j, rc, prev, plen, lastx, lasty, done = lax.fori_loop(0, n_steps, step, init)
        out_scalars_ref[0] = plen
        out_scalars_ref[1] = t
        out_scalars_ref[2] = j
        out_scalars_ref[3] = (j >= ref_len).astype(jnp.int32)

    return kernel


@partial(jax.jit, static_argnames=("cfg", "n_steps"))
def _pallas_set_live(ref_pad, live_pad, lens, cfg: OnlineConfig, n_steps: int):
    f_pad, n_pad = ref_pad.shape
    live_pad_w = live_pad.shape[1]
    c = cfg.c
    p_pad = _round_up(n_steps + 8, _LANES)
    kernel = _make_kernel(cfg, c, n_pad, live_pad_w, n_steps)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((p_pad,), jnp.int32),
            jax.ShapeDtypeStruct((p_pad,), jnp.int32),
            jax.ShapeDtypeStruct((8,), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((c + 1, n_pad), jnp.float32)],
    )(lens, ref_pad, live_pad)


def pallas_set_live(ref, live, params, *, monotone_path=False, euclidean=False, sentinel=1e10, run_count_init=1):
    """Batch-align one pair with the fused kernel.

    Returns ``(path (L, 2) int32 numpy, live_ptr, ref_ptr, stopped)``.
    """
    from real_time_audio_sync_tpu.config import OTWParams

    p = OTWParams.from_any(params)
    cfg = OnlineConfig(
        c=p.c,
        max_run_count=p.max_run_count,
        sentinel=sentinel,
        run_count_init=run_count_init,
        monotone_path=monotone_path,
        euclidean=euclidean,
    )
    ref = np.asarray(ref, np.float32)
    live = np.asarray(live, np.float32)
    f, n = ref.shape
    t = live.shape[1]
    if n < cfg.c:
        raise ValueError("reference shorter than the search band")

    f_pad = _round_up(f, _SUBLANES)
    n_pad = _round_up(n, _LANES)
    live_w = _round_up(cfg.c + t, _LANES)
    ref_pad = np.zeros((f_pad, n_pad), np.float32)
    ref_pad[:f, :n] = ref
    live_pad = np.zeros((f_pad, live_w), np.float32)
    live_pad[:f, cfg.c : cfg.c + t] = live

    n_steps = t + n
    lens = np.asarray([t, n], np.int32)
    px, py, scalars = _pallas_set_live(
        jnp.asarray(ref_pad), jnp.asarray(live_pad), jnp.asarray(lens), cfg, n_steps
    )
    plen = int(scalars[0])
    path = np.stack([np.asarray(px)[:plen], np.asarray(py)[:plen]], axis=1)
    return path, int(scalars[1]), int(scalars[2]), bool(int(scalars[3]))
