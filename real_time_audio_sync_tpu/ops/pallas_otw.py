"""Fused Pallas kernel: the entire online-time-warping alignment in ONE
kernel launch.

The XLA engine (models/online_core.py) runs the Dixon recurrence as a
lax.scan whose every step issues ~30 small HLO ops; this kernel keeps the
complete engine state in VMEM and executes the whole set_live loop inside a
single ``fori_loop``.

Round-2 redesign (the round-1 version addressed the band with *dynamic*
full-width lane rotations and lost to the XLA scan at small N):

- **band-relative window**: VMEM scratch ``W[a, b] = acc[t-c+a, j-c+b]`` —
  a (c+1)×(c+1) sliding window pinned to the DP frontier.  Advancing ``t``
  is one *static* sublane roll; advancing ``j`` one *static* lane roll
  (Mosaic lowers static shifts natively; dynamic lane offsets would need
  128-alignment).  Only O(c²) state, vs the reference's dense (2N, N)
  matrices (otw_eran.py:23-27) — rows ≤ t−c / columns ≤ j−c are never read
  again, the same banded-locality argument as SURVEY.md §5.7.
- **transposed features**: ref/live are stored (time, feature) with ``c``
  leading pad rows, so band feature reads are dynamic *sublane* slices
  (allowed at any offset).  Band cost vectors come out of ``dot_general``
  contractions directly in the orientation each update needs — row bands on
  lanes, column bands on sublanes — with no relayouts.
- the within-band min-plus chain is a Hillis–Steele doubling scan over
  exactly c+1 positions (log₂ c static-shift stages);
- band argmins as min + first-match, preserving the reference's
  ``np.argmin`` first-min tie order even when computed cells equal the
  uncomputed-cell sentinel;
- direction logic, run-count and path commits as scalar carries, with path
  points stored to SMEM.

Semantics match ``set_live_scan`` (otw_eran.py:91-142 / livenote.py:102-149);
parity is enforced by tests against the XLA engine (interpret mode on CPU,
non-interpret on hardware via tests/test_tpu_hardware.py).  The dense
``acc_cost`` matrix is not materialized in this backend.

Measured on 1× v5e (wall, incl. one relay read): 34 ms vs the scan engine's
111 ms at N=380, 57 vs 214 ms at N=1900 — 3.2-3.8× with exact path parity;
the kernel body itself sweeps ~8 µs/step.
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


def _minplus_doubling(b, cost, length: int, axis: int):
    """Hillis–Steele inclusive scan of ``r_k = min(b_k, r_{k-1} + c_k)``
    along ``axis`` (static ``length``).

    Shifts use the native TPU rotate (static shift) with an iota mask —
    concatenation-based shifts trigger Mosaic relayouts.
    """
    inf = np.float32(np.inf)
    zero = np.float32(0.0)
    iota = lax.broadcasted_iota(jnp.int32, b.shape, axis)

    def shifted(x, n, fill):
        return jnp.where(iota < n, fill, pltpu.roll(x, n, axis=axis))

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


def _make_kernel(cfg: OnlineConfig, c: int, w_sub: int, w_lane: int, n_steps: int, debug_window: bool = False):
    sentinel = np.float32(cfg.sentinel)
    inf = np.float32(np.inf)
    two = np.float32(2.0)

    def kernel(
        lens_ref,  # SMEM (2,): [live_len, ref_len]
        ref_ref,  # VMEM (c + n_pad + w_lane, 128): ref^T, row j+c ↔ ref col j
        live_ref,  # VMEM (c + t_pad + w_sub, 128): live^T, row t+c ↔ live col t
        eye_ref,  # VMEM (w_lane, w_lane) identity: transposes small sublane
        #           vectors onto lanes exactly (euclidean row costs only) —
        #           y = dot(xᵀ, I) moves each element through one 1.0
        #           multiply and 0.0 adds, value-preserving
        path_x_ref,  # SMEM (p_pad,) int32
        path_y_ref,  # SMEM (p_pad,) int32
        out_scalars_ref,  # SMEM (8,) int32: plen, t, j, stopped
        *rest,  # [w_out_ref (debug)], w_ref scratch
    ):
        if debug_window:
            w_out_ref, w_ref = rest
        else:
            (w_ref,) = rest
            w_out_ref = None
        live_len = lens_ref[0]
        ref_len = lens_ref[1]
        live_cap = 2 * ref_len  # pre-allocated live capacity (otw_eran.py:14)

        w_ref[:] = jnp.full_like(w_ref, sentinel)

        lane_iota = lax.broadcasted_iota(jnp.int32, (1, w_lane), 1)
        sub_iota = lax.broadcasted_iota(jnp.int32, (w_sub, 1), 0)
        sent_row = jnp.full((1, w_lane), sentinel, jnp.float32)

        def _to_lanes(s):
            """Exact (w_lane, 1) → (1, w_lane) transpose: dot with the
            identity routes each element through one 1.0 multiply and 0.0
            adds.  Precision.HIGHEST forces the exact f32 (bf16x3) MXU path —
            the default single-pass truncates the inputs to bf16 and loses
            ~3e-3, which flips tie decisions on real audio."""
            return lax.dot_general(
                s, eye_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )

        # Costs are computed as elementwise multiply + balanced lane-tree
        # reduction — the same summation tree XLA emits for the engine's
        # 12-feature cost matvec, so cost values (and therefore tie decisions
        # on near-silent real audio) match the XLA engine bit-for-bit.  An
        # MXU dot_general here accumulates sequentially along K and flips
        # ulp-level ties.

        def row_cost(t, j):
            """(1, w_lane): cost(live t, ref j-c+b) on lanes b."""
            live_row = live_ref[pl.ds(t + c, 1), :]  # (1, 128)
            ref_win = ref_ref[pl.ds(j, w_lane), :]  # (w_lane, 128), row b ↔ ref j-c+b
            if cfg.euclidean:
                d = ref_win - live_row
                s = jnp.sum(d * d, axis=1, keepdims=True)  # (w_lane, 1)
                return jnp.sqrt(_to_lanes(s))
            dots = jnp.sum(ref_win * live_row, axis=1, keepdims=True)  # (w_lane, 1)
            return 1.0 - _to_lanes(dots)

        def col_cost(t, j):
            """(w_sub, 1): cost(live t-c+a, ref j) on sublanes a."""
            live_win = live_ref[pl.ds(t, w_sub), :]  # (w_sub, 128), row a ↔ live t-c+a
            ref_row = ref_ref[pl.ds(j + c, 1), :]  # (1, 128)
            if cfg.euclidean:
                d = live_win - ref_row
                return jnp.sqrt(jnp.sum(d * d, axis=1, keepdims=True))
            return 1.0 - jnp.sum(live_win * ref_row, axis=1, keepdims=True)

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
            """otw_eran.py:192-211 over window row c / window lane c."""
            b0 = jnp.maximum(c - j, 1)  # band lanes [b0, c] ↔ refs [max(0,j-c+1), j]
            row = w_ref[c : c + 1, :]
            cost_j, bj = _first_min(row, (lane_iota >= b0) & (lane_iota <= c), lane_iota)
            best_j = j - c + bj

            a0 = jnp.maximum(c - t, 1)
            colv = w_ref[:, c : c + 1]
            cost_t, ak = _first_min(colv, (sub_iota >= a0) & (sub_iota <= c), sub_iota)
            best_t = t - c + ak

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
            """Advance the window one live row and evaluate the row band at
            the new frame t (otw_eran.py:58-62)."""
            w_ref[:] = pltpu.roll(w_ref[:], w_sub - 1, axis=0)  # W[a] ← W[a+1]
            w_ref[c : c + 1, :] = sent_row  # fresh row: uncomputed sentinel

            cost = row_cost(t, j)  # (1, w_lane), lane b ↔ ref k = j-c+b
            up = w_ref[c - 1 : c, :]  # acc[t-1, j-c+b]
            diag = pltpu.roll(up, 1, axis=1)  # acc[t-1, j-c+b-1]
            # cell k=0 has no diagonal (otw_eran.py:233); lane 0 wraps garbage
            diag = jnp.where((lane_iota + (j - c) == 0) | (lane_iota == 0), inf, diag)

            b0 = jnp.maximum(c - j, 1)
            band = (lane_iota >= b0) & (lane_iota <= c)
            bvec = jnp.minimum(up + cost, diag + two * cost)
            b_m = jnp.where(band, bvec, inf)
            c_m = jnp.where(band, cost, inf)
            # left neighbour of the band's first cell: the uncomputed
            # sentinel when the band is unclamped (j >= c), no left step at
            # all for cell (t, 0)
            r_init = jnp.where(j >= c, sentinel, inf)
            b_m = jnp.where(lane_iota == b0, jnp.minimum(b_m, r_init + c_m), b_m)
            chain = _minplus_doubling(b_m, c_m, c + 1, axis=1)
            w_ref[c : c + 1, :] = jnp.where(band, chain, sent_row)

        def col_update(t, j):
            """Advance the window one ref column and evaluate the column band
            at the fresh column j (otw_eran.py:73-77)."""
            rolled = pltpu.roll(w_ref[:], w_lane - 1, axis=1)  # W[b] ← W[b+1]
            w_ref[:] = jnp.where(lane_iota == c, sentinel, rolled)

            cost = col_cost(t, j)  # (w_sub, 1), sublane a ↔ live k = t-c+a
            left = w_ref[:, c - 1 : c]  # acc[t-c+a, j-1]
            diag = pltpu.roll(left, 1, axis=0)  # acc[t-c+a-1, j-1]
            diag = jnp.where((sub_iota + (t - c) == 0) | (sub_iota == 0), inf, diag)

            a0 = jnp.maximum(c - t, 1)
            band = (sub_iota >= a0) & (sub_iota <= c)
            bvec = jnp.minimum(left + cost, diag + two * cost)
            b_m = jnp.where(band, bvec, inf)
            c_m = jnp.where(band, cost, inf)
            # 'up' neighbour of the band's first cell: acc[t-c, j] — always
            # the sentinel, column j is fresh; no up step at all for (0, j)
            r_init = jnp.where(t >= c, sentinel, inf)
            b_m = jnp.where(sub_iota == a0, jnp.minimum(b_m, r_init + c_m), b_m)
            chain = _minplus_doubling(b_m, c_m, c + 1, axis=0)
            w_ref[:] = jnp.where(
                (lane_iota == c) & band, chain, w_ref[:]
            )

        # --- initial condition: eval (0, 0) (otw_eran.py:100)
        lv0 = live_ref[pl.ds(c, 1), :]
        rf0 = ref_ref[pl.ds(c, 1), :]
        if cfg.euclidean:
            c00 = jnp.sqrt(jnp.sum((lv0 - rf0) * (lv0 - rf0)))
        else:
            c00 = 1.0 - jnp.sum(lv0 * rf0)
        w_ref[c : c + 1, :] = jnp.where(lane_iota == c, c00, sent_row)

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
        if w_out_ref is not None:
            w_out_ref[:] = w_ref[:]

    return kernel


@partial(jax.jit, static_argnames=("cfg", "n_steps", "debug_window"))
def _pallas_set_live(ref_t_pad, live_t_pad, lens, cfg: OnlineConfig, n_steps: int, debug_window: bool = False):
    c = cfg.c
    w_lane = _round_up(c + 1, _LANES)
    w_sub = _round_up(c + 1, _SUBLANES)
    p_pad = _round_up(n_steps + 8, _LANES)
    kernel = _make_kernel(cfg, c, w_sub, w_lane, n_steps, debug_window)
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((p_pad,), jnp.int32),
        jax.ShapeDtypeStruct((p_pad,), jnp.int32),
        jax.ShapeDtypeStruct((8,), jnp.int32),
    ]
    if debug_window:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((w_sub, w_lane), jnp.float32))
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((w_sub, w_lane), jnp.float32)],
    )(lens, ref_t_pad, live_t_pad, jnp.eye(w_lane, dtype=jnp.float32))


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
    c = cfg.c
    if n < c:
        raise ValueError("reference shorter than the search band")
    if f > _LANES:
        raise ValueError(f"feature dim {f} exceeds the {_LANES}-lane layout")

    w_lane = _round_up(c + 1, _LANES)
    w_sub = _round_up(c + 1, _SUBLANES)
    # transposed feature layouts with c leading pad rows: band reads become
    # dynamic SUBLANE slices (any offset), never dynamic lane offsets
    ref_t_pad = np.zeros((_round_up(c + n + w_lane + 8, _SUBLANES), _LANES), np.float32)
    ref_t_pad[c : c + n, :f] = ref.T
    live_t_pad = np.zeros((_round_up(c + t + w_sub + 8, _SUBLANES), _LANES), np.float32)
    live_t_pad[c : c + t, :f] = live.T

    n_steps = t + n
    lens = np.asarray([t, n], np.int32)
    out = _pallas_set_live(
        jnp.asarray(ref_t_pad), jnp.asarray(live_t_pad), jnp.asarray(lens), cfg, n_steps
    )
    # one batched device→host fetch: sequential per-array reads each pay a
    # full relay round-trip (~27 ms) on tunneled TPUs
    px, py, scalars = jax.device_get(out)
    plen = int(scalars[0])
    path = np.stack([px[:plen], py[:plen]], axis=1)
    return path, int(scalars[1]), int(scalars[2]), bool(int(scalars[3]))
