"""Fused Pallas kernels: online-time-warping alignment on a band-relative
VMEM window.

The XLA engine (models/online_core.py) runs the Dixon recurrence as a
lax.scan whose every step issues ~30 small HLO ops; the kernels here keep
the complete engine state in VMEM and execute many alignment steps per
launch.  Two drivers share one set of band primitives:

- :func:`pallas_set_live` — the whole batch alignment (otw_eran.py:91-142)
  in ONE launch;
- :func:`_pallas_insert_block` — K streaming inserts (otw_eran.py:38-85) per
  launch with the engine state (window, live features, path, scalars)
  carried across launches via ``input_output_aliases`` — the fused
  *streaming* backend (models/fused_streaming.py wraps it).  CAUTION:
  aliasing is not reliably honored through jit on every platform (observed:
  interleaving any unrelated dispatch between launches handed the "aliased"
  VMEM outputs fresh uninitialized buffers), so the kernel defensively
  self-copies the VMEM state in→out; the SMEM path buffers carry correctly
  under all tested interleavings (hardware regression in
  tests/test_tpu_hardware.py).

Core design (round 2; the round-1 version addressed the band with dynamic
full-width lane rotations and lost to the XLA scan at small N):

- **band-relative window**: ``W[a, b] = acc[t-c+a, j-c+b]`` — a (c+1)×(c+1)
  sliding window pinned to the DP frontier.  Advancing ``t`` is one *static*
  sublane roll; advancing ``j`` one *static* lane roll (Mosaic lowers static
  shifts natively; dynamic lane offsets would need 128-alignment).  Only
  O(c²) state, vs the reference's dense (2N, N) matrices
  (otw_eran.py:23-27) — rows ≤ t−c / columns ≤ j−c are never read again,
  the same banded-locality argument as SURVEY.md §5.7.
- **transposed features**: ref/live are stored (time, feature) with ``c``
  leading pad rows, so band feature reads are dynamic *sublane* slices
  (allowed at any offset).  Costs are elementwise multiply + balanced
  lane-tree reductions — the same summation tree XLA emits for the engine's
  cost matvec, so tie decisions on near-silent real audio match the XLA
  engine bit-for-bit (an MXU dot_general accumulates sequentially and flips
  ulp-level ties).
- the within-band min-plus chain is a Hillis–Steele doubling scan over
  exactly c+1 positions (log₂ c static-shift stages);
- band argmins as min + first-match, preserving the reference's
  ``np.argmin`` first-min tie order even when computed cells equal the
  uncomputed-cell sentinel;
- direction logic, run-count and path commits as scalar carries, with path
  points stored to SMEM.

Parity is enforced by tests against the XLA engine (interpret mode on CPU,
non-interpret on hardware via tests/test_tpu_hardware.py).  The dense
``acc_cost`` matrix is not materialized in this backend.

Measured on 1× v5e (wall, incl. one relay read): set_live 34 ms vs the scan
engine's 111 ms at N=380, 57 vs 214 ms at N=1900 — 3.2-3.8× with exact path
parity; the kernel body itself sweeps ~8 µs/step.
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


def _squeezed_batch_spec(shape_tail, mem):
    """BlockSpec for one stream's block of a batch-leading array in a 1-D
    grid over streams: the leading dim is squeezed (None) and grid step i
    maps to batch row i.  SMEM operands must arrive row-shaped (B, 1, X) —
    Mosaic requires squeezed-batch SMEM blocks to keep their last two dims
    equal to the array's."""
    zeros = (0,) * len(shape_tail)
    return pl.BlockSpec((None, *shape_tail), lambda i: (i, *zeros), memory_space=mem)


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


def _build_ops(cfg: OnlineConfig, c: int, w_sub: int, w_lane: int,
               w_ref, ref_ref, live_ref, eye_ref, path_store,
               live_off=0, ref_off=0):
    """Shared band primitives over the window/feature refs.

    ``path_store(plen, x, y)`` commits one path point — a callback so the
    same body serves 1-D SMEM path buffers (solo drivers) and row-shaped
    (1, P) buffers (the batched driver, whose squeezed-batch SMEM blocks
    must keep their last two dims equal to the array's).

    ``live_off``/``ref_off`` (long-reference mode): the feature refs are
    sliding VMEM *windows* instead of whole transposed sequences — virtual
    row ``v`` of the standard layout lives at physical row ``v - off``.
    The offsets are launch-constant scalars (the long driver realigns the
    windows in its prologue), so every access below subtracts them inside
    ``pl.ds``; the default 0 reproduces the whole-buffer layout verbatim."""
    sentinel = np.float32(cfg.sentinel)
    inf = np.float32(np.inf)
    two = np.float32(2.0)

    lane_iota = lax.broadcasted_iota(jnp.int32, (1, w_lane), 1)
    sub_iota = lax.broadcasted_iota(jnp.int32, (w_sub, 1), 0)
    sent_row = jnp.full((1, w_lane), sentinel, jnp.float32)

    def _to_lanes(s):
        """Exact (w_lane, 1) → (1, w_lane) transpose: dot with the identity
        routes each element through one 1.0 multiply and 0.0 adds.
        Precision.HIGHEST forces the exact f32 (bf16x3) MXU path — the
        default single-pass truncates the inputs to bf16 and loses ~3e-3,
        which flips tie decisions on real audio."""
        return lax.dot_general(
            s, eye_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )

    def row_cost(t, j):
        """(1, w_lane): cost(live t, ref j-c+b) on lanes b."""
        live_row = live_ref[pl.ds(t + c - live_off, 1), :]  # (1, 128)
        ref_win = ref_ref[pl.ds(j - ref_off, w_lane), :]  # (w_lane, 128), row b ↔ ref j-c+b
        if cfg.euclidean:
            d = ref_win - live_row
            s = jnp.sum(d * d, axis=1, keepdims=True)  # (w_lane, 1)
            return jnp.sqrt(_to_lanes(s))
        dots = jnp.sum(ref_win * live_row, axis=1, keepdims=True)  # (w_lane, 1)
        return 1.0 - _to_lanes(dots)

    def col_cost(t, j):
        """(w_sub, 1): cost(live t-c+a, ref j) on sublanes a."""
        live_win = live_ref[pl.ds(t - live_off, w_sub), :]  # (w_sub, 128), row a ↔ live t-c+a
        ref_row = ref_ref[pl.ds(j + c - ref_off, 1), :]  # (1, 128)
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
            path_store(plen, x.astype(jnp.int32), y.astype(jnp.int32))

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
        """Advance the window one live row and evaluate the row band at the
        new frame t (otw_eran.py:58-62)."""
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
        # left neighbour of the band's first cell: the uncomputed sentinel
        # when the band is unclamped (j >= c), no left step at all for (t, 0)
        r_init = jnp.where(j >= c, sentinel, inf)
        b_m = jnp.where(lane_iota == b0, jnp.minimum(b_m, r_init + c_m), b_m)
        chain = _minplus_doubling(b_m, c_m, c + 1, axis=1)
        w_ref[c : c + 1, :] = jnp.where(band, chain, sent_row)

    def col_update(t, j):
        """Advance the window one ref column and evaluate the column band at
        the fresh column j (otw_eran.py:73-77)."""
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
        # 'up' neighbour of the band's first cell: acc[t-c, j] — always the
        # sentinel, column j is fresh; no up step at all for (0, j)
        r_init = jnp.where(t >= c, sentinel, inf)
        b_m = jnp.where(sub_iota == a0, jnp.minimum(b_m, r_init + c_m), b_m)
        chain = _minplus_doubling(b_m, c_m, c + 1, axis=0)
        w_ref[:] = jnp.where((lane_iota == c) & band, chain, w_ref[:])

    def eval_origin():
        """acc[0,0] = cost(0,0) at window cell (c, c) (otw_eran.py:223-225)."""
        lv0 = live_ref[pl.ds(c - live_off, 1), :]
        rf0 = ref_ref[pl.ds(c - ref_off, 1), :]
        if cfg.euclidean:
            c00 = jnp.sqrt(jnp.sum((lv0 - rf0) * (lv0 - rf0)))
        else:
            c00 = 1.0 - jnp.sum(lv0 * rf0)
        w_ref[c : c + 1, :] = jnp.where(lane_iota == c, c00, sent_row)

    return dict(
        row_cost=row_cost, col_cost=col_cost, append_point=append_point,
        best_point=best_point, set_direction=set_direction,
        row_update=row_update, col_update=col_update, eval_origin=eval_origin,
        sent_row=sent_row,
    )


# ---------------------------------------------------------------------------
# Driver 1: whole-sequence set_live (otw_eran.py:91-142)
# ---------------------------------------------------------------------------


def _make_set_live_kernel(cfg: OnlineConfig, c: int, w_sub: int, w_lane: int, n_steps: int, batched: bool = False):
    def kernel(
        lens_ref,  # SMEM (2,): [live_len, ref_len]  ((1, 2) when batched)
        ref_ref,  # VMEM (c + n_pad + w_lane, 128): ref^T, row j+c ↔ ref col j
        live_ref,  # VMEM (c + t_pad + w_sub, 128): live^T, row t+c ↔ live col t
        eye_ref,  # VMEM (w_lane, w_lane) identity (see _build_ops._to_lanes)
        path_x_ref,  # SMEM (p_pad,) int32  ((1, p_pad) when batched)
        path_y_ref,  # SMEM (p_pad,) int32
        out_scalars_ref,  # SMEM (8,) int32: plen, t, j, stopped
        w_ref,  # VMEM scratch: band-relative (c+1)x(c+1) acc window
    ):
        if batched:  # row-shaped SMEM blocks (see _make_insert_kernel)
            ld = lambda r, i: r[0, i]

            def st(r, i, v):
                r[0, i] = v
        else:
            ld = lambda r, i: r[i]

            def st(r, i, v):
                r[i] = v

        live_len = ld(lens_ref, 0)
        ref_len = ld(lens_ref, 1)
        live_cap = 2 * ref_len  # pre-allocated live capacity (otw_eran.py:14)

        w_ref[:] = jnp.full_like(w_ref, np.float32(cfg.sentinel))

        def path_store(plen, x, y):
            st(path_x_ref, plen, x)
            st(path_y_ref, plen, y)

        ops = _build_ops(cfg, c, w_sub, w_lane, w_ref, ref_ref, live_ref, eye_ref, path_store)
        ops["eval_origin"]()

        def step(_, carry):
            t, j, rc, prev, plen, lastx, lasty, done = carry

            def body(args):
                t, j, rc, prev, plen, lastx, lasty = args
                d, rc, prev, plen, lastx, lasty = ops["set_direction"](t, j, rc, prev, plen, lastx, lasty)

                # row step
                do_row = d != COL
                t_new = jnp.where(do_row, t + 1, t)
                row_done = do_row & ((t_new >= live_len) | (t_new >= live_cap))

                @pl.when(do_row & ~row_done)
                def _():
                    ops["row_update"](t_new, j)

                done2 = row_done

                # column step (skipped when the row step broke out)
                do_col = (d != ROW) & ~done2
                j_new = jnp.where(do_col, j + 1, j)
                col_done = do_col & (j_new >= ref_len)

                @pl.when(do_col & ~col_done)
                def _():
                    ops["col_update"](t_new, j_new)

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
        st(out_scalars_ref, 0, plen)
        st(out_scalars_ref, 1, t)
        st(out_scalars_ref, 2, j)
        st(out_scalars_ref, 3, (j >= ref_len).astype(jnp.int32))

    return kernel


@partial(jax.jit, static_argnames=("cfg", "n_steps"))
def _pallas_set_live(ref_t_pad, live_t_pad, lens, cfg: OnlineConfig, n_steps: int):
    c = cfg.c
    w_lane = _round_up(c + 1, _LANES)
    w_sub = _round_up(c + 1, _SUBLANES)
    p_pad = _round_up(n_steps + 8, _LANES)
    kernel = _make_set_live_kernel(cfg, c, w_sub, w_lane, n_steps)
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


# pairs whose combined frame count exceeds this delegate to the long-
# reference STREAMING engine instead of the whole-sequence kernel (whose
# transposed ref+live VMEM buffers, ~512 B/frame, would blow the ~16 MB
# budget).  set_live is a scan of insert steps (otw_eran.py:91-142), so the
# committed path is identical (tested).
_SET_LIVE_LONG_N = 12000


def pallas_set_live(ref, live, params, *, monotone_path=False, euclidean=False, sentinel=1e10, run_count_init=1):
    """Batch-align one pair with the fused kernel.

    Returns ``(path (L, 2) int32 numpy, live_ptr, ref_ptr, stopped)``.
    Hour-scale pairs (combined frames ≥ ``_SET_LIVE_LONG_N``) run through
    the long-reference streaming engine — same committed path, O(c) VMEM.
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

    if n + t >= _SET_LIVE_LONG_N:
        from real_time_audio_sync_tpu.models.fused_streaming import FusedStreamingEngine

        eng = FusedStreamingEngine(
            ref, {"c": p.c, "max_run_count": p.max_run_count},
            cfg_overrides=dict(sentinel=sentinel, run_count_init=run_count_init,
                               monotone_path=monotone_path, euclidean=euclidean),
            k_block=8, long_ref=True,
        )
        # set_live appends best_point (0, 0) right after the origin eval,
        # BEFORE the first row/column step (otw_eran.py:103-107) — the one
        # place its path differs from frame-by-frame insert (verified across
        # engines/seeds); the engine owns the seeding of that state.
        eng.seed_origin_point()
        for s in range(0, t, 8):
            if eng.insert_block_nowait(live[:, s : s + 8]) == "stop":
                break
        eng.flush()
        sc = np.asarray(eng._state[2])
        stopped = bool(sc[_S_STOPPED])
        # pointer convention parity: set_live's live_ptr counts one past the
        # last frame when live runs out WITHOUT a stop (the loop's final t
        # advance, otw_eran.py:99) and halts at the 2N live capacity
        # (otw_eran.py:14), whereas streaming insert keeps counting frozen
        # no-op inserts past the cap (otw_eran.py:50-54) — both are
        # reference-faithful for their own mode; on a stop they agree
        live_ptr = int(sc[_S_T]) if stopped else min(int(sc[_S_T]) + 1, 2 * n)
        return eng.path_array, live_ptr, int(sc[_S_J]), stopped

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


@partial(jax.jit, static_argnames=("cfg", "n_steps", "shared_ref", "interpret"))
def _pallas_batched_set_live(ref_t_pad, live_t_pad, lens, cfg: OnlineConfig, n_steps: int, shared_ref: bool = False, interpret: bool = False):
    """Whole-sequence alignment for B pairs in ONE launch: a 1-D grid over
    pairs, each grid step running the exact solo set_live kernel (per-pair
    early exit via its `done` flag; see _pallas_multi_insert_block for the
    squeezed-batch BlockSpec pattern and row-shaped SMEM layout).

    Replaces the O(B·N²)-memory vmapped XLA path for corpus sweeps: state
    here is one (c+1)² window scratch per grid step."""
    b = live_t_pad.shape[0]
    c = cfg.c
    w_lane = _round_up(c + 1, _LANES)
    w_sub = _round_up(c + 1, _SUBLANES)
    p_pad = _round_up(n_steps + 8, _LANES)
    kernel = _make_set_live_kernel(cfg, c, w_sub, w_lane, n_steps, batched=True)
    vmem, smem = pltpu.VMEM, pltpu.SMEM

    def _batched(arr_shape, mem):
        return _squeezed_batch_spec(tuple(arr_shape[1:]), mem)

    ref_spec = pl.BlockSpec(
        (None, *ref_t_pad.shape[1:]),
        (lambda i: (0, 0, 0)) if shared_ref else (lambda i: (i, 0, 0)),
        memory_space=vmem,
    )
    eye = jnp.eye(w_lane, dtype=jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            _batched(lens.shape, smem),
            ref_spec,
            _batched(live_t_pad.shape, vmem),
            pl.BlockSpec(eye.shape, lambda i: (0, 0), memory_space=vmem),
        ],
        out_specs=(
            _batched((b, 1, p_pad), smem),
            _batched((b, 1, p_pad), smem),
            _batched((b, 1, 8), smem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, p_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, p_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, 8), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((w_sub, w_lane), jnp.float32)],
        interpret=interpret,
    )(lens, ref_t_pad, live_t_pad, eye)


def pallas_batched_set_live(refs, lives, params, *, monotone_path=False, euclidean=False, sentinel=1e10, run_count_init=1, interpret=False):
    """Batch-align B pairs with the fused kernel, one launch total.

    ``refs``/``lives``: sequences of (F, Nᵢ)/(F, Tᵢ) float arrays (ragged;
    zero-padded here — true lengths drive each pair's stop conditions).
    Returns a list of per-pair ``(path (L, 2) int32, live_ptr, ref_ptr,
    stopped)`` tuples exactly matching per-pair :func:`pallas_set_live`.
    """
    from real_time_audio_sync_tpu.config import OTWParams

    p = OTWParams.from_any(params)
    cfg = OnlineConfig(
        c=p.c, max_run_count=p.max_run_count, sentinel=sentinel,
        run_count_init=run_count_init, monotone_path=monotone_path,
        euclidean=euclidean,
    )
    refs = [np.asarray(r, np.float32) for r in refs]
    lives = [np.asarray(l, np.float32) for l in lives]
    b = len(refs)
    if len(lives) != b:
        raise ValueError(f"{b} refs vs {len(lives)} lives")
    f = refs[0].shape[0]
    c = cfg.c
    n_max = max(r.shape[1] for r in refs)
    t_max = max(l.shape[1] for l in lives)
    if min(r.shape[1] for r in refs) < c:
        raise ValueError("reference shorter than the search band")
    if f > _LANES:
        raise ValueError(f"feature dim {f} exceeds the {_LANES}-lane layout")

    if n_max + t_max >= _SET_LIVE_LONG_N:
        # the batched kernel's whole-sequence VMEM buffers scale with the
        # PADDED lengths (~512 B/frame/pair) and would blow the VMEM budget
        # exactly where solo pallas_set_live starts delegating — so delegate
        # per pair too (long pairs run the O(c)-VMEM long-reference engine);
        # the per-pair results contract is preserved by construction
        import contextlib

        ctx = (pltpu.force_tpu_interpret_mode() if interpret
               else contextlib.nullcontext())
        with ctx:
            return [
                pallas_set_live(
                    r, l, params, monotone_path=monotone_path,
                    euclidean=euclidean, sentinel=sentinel,
                    run_count_init=run_count_init,
                )
                for r, l in zip(refs, lives)
            ]

    w_lane = _round_up(c + 1, _LANES)
    w_sub = _round_up(c + 1, _SUBLANES)
    shared = b > 1 and all(r.shape == refs[0].shape and np.array_equal(r, refs[0]) for r in refs[1:])
    n_ref_rows = 1 if shared else b
    ref_t = np.zeros((n_ref_rows, _round_up(c + n_max + w_lane + 8, _SUBLANES), _LANES), np.float32)
    for i in range(n_ref_rows):
        r = refs[i]
        ref_t[i, c : c + r.shape[1], :f] = r.T
    live_t = np.zeros((b, _round_up(c + t_max + w_sub + 8, _SUBLANES), _LANES), np.float32)
    lens = np.zeros((b, 1, 2), np.int32)
    for i, l in enumerate(lives):
        live_t[i, c : c + l.shape[1], :f] = l.T
        lens[i, 0] = (l.shape[1], refs[i].shape[1])

    n_steps = t_max + n_max
    px, py, scalars = jax.device_get(
        _pallas_batched_set_live(
            jnp.asarray(ref_t), jnp.asarray(live_t), jnp.asarray(lens), cfg,
            n_steps, shared_ref=shared, interpret=interpret,
        )
    )
    out = []
    for i in range(b):
        plen = int(scalars[i, 0, 0])
        path = np.stack([px[i, 0, :plen], py[i, 0, :plen]], axis=1)
        out.append((path, int(scalars[i, 0, 1]), int(scalars[i, 0, 2]), bool(int(scalars[i, 0, 3]))))
    return out


# ---------------------------------------------------------------------------
# Driver 2: K streaming inserts per launch (otw_eran.py:38-85), state carried
# across launches via input_output_aliases
# ---------------------------------------------------------------------------

# scalar-state slots (SMEM int32 vector)
(_S_T, _S_J, _S_RC, _S_PREV, _S_PLEN, _S_LASTX, _S_LASTY, _S_FIRST,
 _S_STOPPED, _S_DIR, _S_OVERFLOW) = range(11)
_N_SCALARS = 16


def _insert_block_body(cfg: OnlineConfig, k_block: int, ld, st, lens_ref,
                       cols_ref, live_ref, sc_ref, status_ref, ops, c: int,
                       live_base=0):
    """The K-insert state machine shared by the standard and long insert
    kernels: the per-insert row step, the bounded column phase
    (otw_eran.py:38-85), the 11-field scalar carry across the block, and
    the scalar-state + status epilogue.  ``live_base`` is the virtual live
    row at physical row 0 — 0 for the whole-history standard kernel, the
    sliding-window base for the long kernel (the ONLY difference between
    the two bodies)."""
    live_cap = ld(lens_ref, 0)
    ref_len = ld(lens_ref, 1)
    n_valid = ld(lens_ref, 2)

    def insert(k, carry):
        t, j, rc, prev, plen, lastx, lasty, first, stopped, direction, overflow_in = carry
        alive = (k < n_valid) & ~stopped
        is_first = alive & first

        # --- first insert: live[:, 0] ← col, eval origin (otw_eran.py:43-48)
        @pl.when(is_first)
        def _():
            live_ref[pl.ds(c - live_base, 1), :] = cols_ref[pl.ds(k, 1), :]
            ops["eval_origin"]()

        first = first & ~is_first

        # --- normal insert: advance t; "ran out of room" keeps
        # incrementing t and does nothing else (otw_eran.py:50-54)
        is_normal = alive & ~is_first
        t_new = jnp.where(is_normal, t + 1, t)
        do_row = is_normal & (t_new < live_cap)

        @pl.when(do_row)
        def _():
            live_ref[pl.ds(t_new + c - live_base, 1), :] = cols_ref[pl.ds(k, 1), :]
            ops["row_update"](t_new, j)

        # --- column phase (otw_eran.py:64-85): bounded loop; consecutive
        # Column directions cap at max_run_count (models/online_core.py)
        def phase(_, ph):
            j2, rc2, prev2, plen2, lx2, ly2, stopped2, active, d2 = ph
            do_col = active & (d2 != ROW)
            j_new = jnp.where(do_col, j2 + 1, j2)
            new_stop = do_col & (j_new >= ref_len)
            do_eval = do_col & ~new_stop

            @pl.when(do_eval)
            def _():
                ops["col_update"](t_new, j_new)

            stopped3 = stopped2 | new_stop
            do_dir = active & ~new_stop

            def with_dir(args):
                j_new, rc2, prev2, plen2, lx2, ly2 = args
                d3, rc3, prev3, plen3, lx3, ly3 = ops["set_direction"](
                    t_new, j_new, rc2, prev2, plen2, lx2, ly2
                )
                return j_new, rc3, prev3, plen3, lx3, ly3, d3

            def no_dir(args):
                j_new, rc2, prev2, plen2, lx2, ly2 = args
                return j_new, rc2, prev2, plen2, lx2, ly2, d2

            j_new, rc2, prev2, plen2, lx2, ly2, d3 = lax.cond(
                do_dir, with_dir, no_dir, (j_new, rc2, prev2, plen2, lx2, ly2)
            )
            active = do_dir & (d3 == COL)
            return j_new, rc2, prev2, plen2, lx2, ly2, stopped3, active, d3

        ph = (j, rc, prev, plen, lastx, lasty, stopped, do_row, direction)
        j, rc, prev, plen, lastx, lasty, stopped, still_active, direction = lax.fori_loop(
            0, cfg.loop_iters, phase, ph
        )
        overflow = overflow_in | still_active  # loop bound violated (never, by design)
        return t_new, j, rc, prev, plen, lastx, lasty, first, stopped, direction, overflow

    carry = (
        ld(sc_ref, _S_T), ld(sc_ref, _S_J), ld(sc_ref, _S_RC), ld(sc_ref, _S_PREV),
        ld(sc_ref, _S_PLEN), ld(sc_ref, _S_LASTX), ld(sc_ref, _S_LASTY),
        ld(sc_ref, _S_FIRST) != 0, ld(sc_ref, _S_STOPPED) != 0, ld(sc_ref, _S_DIR),
        ld(sc_ref, _S_OVERFLOW) != 0,  # sticky across launches — a violated
        # loop bound must survive until the (rate-limited) status read
    )
    t, j, rc, prev, plen, lastx, lasty, first, stopped, direction, overflow = lax.fori_loop(
        0, k_block, insert, carry
    )
    st(sc_ref, _S_T, t)
    st(sc_ref, _S_J, j)
    st(sc_ref, _S_RC, rc)
    st(sc_ref, _S_PREV, prev)
    st(sc_ref, _S_PLEN, plen)
    st(sc_ref, _S_LASTX, lastx)
    st(sc_ref, _S_LASTY, lasty)
    st(sc_ref, _S_FIRST, first.astype(jnp.int32))
    st(sc_ref, _S_STOPPED, stopped.astype(jnp.int32))
    st(sc_ref, _S_DIR, direction)
    st(sc_ref, _S_OVERFLOW, overflow.astype(jnp.int32))
    st(status_ref, 0, stopped.astype(jnp.int32) | (overflow.astype(jnp.int32) << 1))
    st(status_ref, 1, plen)
    st(status_ref, 2, lastx)
    st(status_ref, 3, lasty)


def _make_insert_kernel(cfg: OnlineConfig, c: int, w_sub: int, w_lane: int, k_block: int, interpret: bool, batched: bool = False):
    def kernel(
        lens_ref,  # SMEM (4,): [live_cap, ref_len, n_valid, 0]
        ref_ref,  # VMEM ref^T (c leading pad rows)
        cols_ref,  # VMEM (k_pad, 128): incoming chroma columns, transposed
        eye_ref,  # VMEM identity
        w_in, live_in, px_in, py_in, sc_in,  # aliased state (inputs)
        w_ref, live_ref, path_x_ref, path_y_ref, sc_ref,  # aliased state (outputs)
        status_ref,  # SMEM (8,) int32: [stopped|overflow<<1, plen, lastx, lasty]
    ):
        # ``batched=True``: the 1-D grid over streams delivers SMEM operands
        # as row-shaped (1, X) blocks (Mosaic requires squeezed-batch blocks
        # to keep the last two dims equal to the array's), so scalar
        # accesses carry a leading 0 index.  VMEM blocks squeeze cleanly and
        # are untouched.
        if batched:
            ld = lambda r, i: r[0, i]

            def st(r, i, v):
                r[0, i] = v
        else:
            ld = lambda r, i: r[i]

            def st(r, i, v):
                r[i] = v

        def path_store(plen, x, y):
            st(path_x_ref, plen, x)
            st(path_y_ref, plen, y)

        # input_output_aliases is NOT reliably honored through jit on every
        # platform (observed: interleaving any unrelated dispatch between
        # launches hands the "aliased" outputs fresh uninitialized buffers),
        # so the VMEM state copies in→out unconditionally (self-copy no-ops
        # when aliasing does hold) and the 16 scalars copy through scalar
        # loads (legal everywhere).  Vector loads from the SMEM path refs
        # are interpreter-only.
        w_ref[:] = w_in[:]
        live_ref[:] = live_in[:]
        if interpret:
            path_x_ref[:] = px_in[:]
            path_y_ref[:] = py_in[:]
        else:
            del px_in, py_in
        for _s in range(_N_SCALARS):
            st(sc_ref, _s, ld(sc_in, _s))
        ops = _build_ops(cfg, c, w_sub, w_lane, w_ref, ref_ref, live_ref, eye_ref, path_store)
        _insert_block_body(cfg, k_block, ld, st, lens_ref, cols_ref, live_ref,
                           sc_ref, status_ref, ops, c)

    return kernel


@partial(jax.jit, static_argnames=("cfg", "k_block", "interpret"), donate_argnames=("w", "live_t", "path_x", "path_y", "scalars"))
def _pallas_insert_block(lens, ref_t_pad, cols, w, live_t, path_x, path_y, scalars, cfg: OnlineConfig, k_block: int, interpret: bool = False):
    if cols.shape[-1] < _LANES:
        # hosts ship narrow (k_pad, f_pad) column blocks — 8x less H2D than
        # the 128-lane layout the kernel wants; the pad runs on-device
        cols = jnp.pad(cols, ((0, 0), (0, _LANES - cols.shape[-1])))
    c = cfg.c
    w_lane = _round_up(c + 1, _LANES)
    w_sub = _round_up(c + 1, _SUBLANES)
    kernel = _make_insert_kernel(cfg, c, w_sub, w_lane, k_block, interpret)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[smem, vmem, vmem, vmem, vmem, vmem, smem, smem, smem],
        out_specs=(vmem, vmem, smem, smem, smem, smem),
        out_shape=(
            jax.ShapeDtypeStruct(w.shape, jnp.float32),
            jax.ShapeDtypeStruct(live_t.shape, jnp.float32),
            jax.ShapeDtypeStruct(path_x.shape, jnp.int32),
            jax.ShapeDtypeStruct(path_y.shape, jnp.int32),
            jax.ShapeDtypeStruct(scalars.shape, jnp.int32),
            jax.ShapeDtypeStruct((8,), jnp.int32),
        ),
        # inputs (lens, ref, cols, eye, w, live_t, px, py, sc) → outputs
        # (w', live_t', px', py', sc', status): state buffers alias in place
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3, 8: 4},
        interpret=interpret,
    )(lens, ref_t_pad, cols, jnp.eye(w_lane, dtype=jnp.float32), w, live_t, path_x, path_y, scalars)


# ---------------------------------------------------------------------------
# Driver 2b: LONG-REFERENCE streaming inserts — O(c) VMEM regardless of N
# ---------------------------------------------------------------------------
#
# The standard insert kernel keeps the whole transposed reference and the
# whole 2N-capacity live history in VMEM, which caps the reference length
# near N ≈ 7.5k frames (~12 minutes; ref (c+N)·512 B + live (c+2N)·512 B
# against ~16 MB of VMEM) — an hour-long concert (N ≈ 39k) cannot compile.
# This driver removes the cap by exploiting the band locality the window
# design already proves (rows ≤ t−c / cols ≤ j−c are never read again):
#
# - the reference stays in HBM (`pl.ANY`); a prologue DMA pulls the
#   r_win-row slice [j₀, j₀+r_win) into a VMEM scratch window (~96 KB),
#   which covers every ref access a k_block-insert launch can make
#   (j advances ≤ k_block·loop_iters);
# - the live history is a sliding VMEM window of l_win rows carried across
#   launches via aliasing; the prologue shifts it so physical row 0 is
#   virtual row t₀ (one dynamic-sublane vector copy of static size — NOT a
#   DMA: squeezed-batch refs reject rank-reducing DMA slices, and the shift
#   distance, though dynamic, is ≤ k_block).  Scalar slot _S_LIVE_BASE
#   carries the window base between launches;
# - committed path points land in a small per-launch SMEM *delta* buffer
#   (indexed plen − plen₀) instead of a device-resident full-path buffer
#   whose SMEM footprint would scale with N; the HOST accumulates deltas
#   in launch order (models/fused_streaming.py drains them through the
#   existing status machinery).
#
# _S_LIVE_BASE aside, state layout and the alignment recurrence are exactly
# the standard kernel's — _build_ops is reused with live_off/ref_off window
# offsets, so committed paths are bit-identical (tested interpret-mode vs
# the XLA engine and on hardware vs the standard kernel).

_S_LIVE_BASE = 11  # scalar slot: virtual row index of live-window phys row 0


def _long_geometry(cfg: OnlineConfig, c: int, w_lane: int, k_block: int):
    """(l_win, l_pad, r_win, d_pad) — static window/buffer sizes shared by
    the kernel, the driver and the engine's state allocation."""
    l_win = _round_up(c + k_block + 16, _SUBLANES)
    max_delta = _round_up(k_block + 8, _SUBLANES)
    r_win = _round_up(w_lane + k_block * cfg.loop_iters + 16, _SUBLANES)
    d_pad = k_block * cfg.loop_iters + 8
    return l_win, l_win + max_delta, r_win, d_pad


def _make_insert_kernel_long(cfg: OnlineConfig, c: int, w_sub: int, w_lane: int,
                             k_block: int, l_win: int, r_win: int,
                             batched: bool = False, shared_ref: bool = True):
    def kernel(
        lens_ref,  # SMEM (4,): [live_cap, ref_len, n_valid, 0]
        ref_hbm_ref,  # ANY/HBM ref^T (c leading pad rows + r_win trailing pad)
        cols_ref,  # VMEM (k_pad, 128): incoming chroma columns, transposed
        eye_ref,  # VMEM identity
        w_in, live_in, sc_in,  # aliased state (inputs)
        w_ref, live_ref, sc_ref,  # aliased state (outputs)
        status_ref,  # SMEM (8,) int32
        dx_ref, dy_ref,  # SMEM (d_pad,) int32: this launch's path delta
        ref_win,  # VMEM scratch: ref window [j0, j0+r_win); (1, r_win, 128)
        #           when batched — a squeezed-batch HBM source rejects
        #           rank-reducing DMA slices, so the copy keeps all 3 dims
        sem_ref,  # DMA semaphore
    ):
        # batched=True: 1-D grid over streams; SMEM operands are row-shaped
        # (1, X) squeezed-batch blocks (see _make_insert_kernel), and the
        # reference stays an UNBLOCKED (1|B, R, 128) ANY array — each grid
        # step DMAs its own stream's window out of it
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
        t0 = ld(sc_ref, _S_T)
        j0 = ld(sc_ref, _S_J)
        plen0 = ld(sc_ref, _S_PLEN)
        old_base = ld(sc_ref, _S_LIVE_BASE)

        # ref window load first — overlaps with the live-window shift
        ref_base = j0
        if batched:
            stream = 0 if shared_ref else pl.program_id(0)
            ref_src = ref_hbm_ref.at[pl.ds(stream, 1), pl.ds(ref_base, r_win)]
        else:
            ref_src = ref_hbm_ref.at[pl.ds(ref_base, r_win)]
        ref_dma = pltpu.make_async_copy(ref_src, ref_win, sem_ref)
        ref_dma.start()

        # live-window realign: retain virtual rows [t0, t0+l_win) at
        # physical [0, l_win).  delta ≤ k_block (per-launch t advance), so
        # delta + l_win ≤ l_pad always; rows ≥ l_win stay unspecified —
        # every virtual row is written by its own insert before any read.
        # A dynamic-sublane vector copy, not a DMA: the load materializes
        # before the store, so the overlapping aliased move is safe, and
        # squeezed-batch refs reject rank-reducing DMA slices.
        new_base = jnp.maximum(old_base, t0)
        delta = new_base - old_base
        live_ref[pl.ds(0, l_win), :] = live_in[pl.ds(delta, l_win), :]
        st(sc_ref, _S_LIVE_BASE, new_base)

        # defensive VMEM self-copy (same aliasing caveat as the standard
        # kernel; no-ops when aliasing holds)
        w_ref[:] = w_in[:]
        ref_dma.wait()
        ref_view = ref_win.at[0] if batched else ref_win

        def path_store(plen, x, y):
            st(dx_ref, plen - plen0, x)
            st(dy_ref, plen - plen0, y)

        ops = _build_ops(cfg, c, w_sub, w_lane, w_ref, ref_view, live_ref,
                         eye_ref, path_store, live_off=new_base, ref_off=ref_base)
        _insert_block_body(cfg, k_block, ld, st, lens_ref, cols_ref, live_ref,
                           sc_ref, status_ref, ops, c, live_base=new_base)

    return kernel


@partial(jax.jit, static_argnames=("cfg", "k_block", "interpret"),
         donate_argnames=("w", "live_win", "scalars"))
def _pallas_insert_block_long(lens, ref_t_hbm, cols, w, live_win, scalars,
                              cfg: OnlineConfig, k_block: int, interpret: bool = False):
    """K streaming inserts per launch with O(c)-sized VMEM state: returns
    (w', live_win', scalars', status, delta_x, delta_y).  The caller
    accumulates the per-launch path deltas host-side in launch order
    (``delta[: plen_end − plen_start]`` are the valid entries)."""
    if cols.shape[-1] < _LANES:
        cols = jnp.pad(cols, ((0, 0), (0, _LANES - cols.shape[-1])))
    c = cfg.c
    w_lane = _round_up(c + 1, _LANES)
    w_sub = _round_up(c + 1, _SUBLANES)
    l_win, l_pad, r_win, d_pad = _long_geometry(cfg, c, w_lane, k_block)
    assert live_win.shape == (l_pad, _LANES), live_win.shape
    kernel = _make_insert_kernel_long(cfg, c, w_sub, w_lane, k_block, l_win, r_win)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    anym = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kernel,
        in_specs=[smem, anym, vmem, vmem, vmem, vmem, smem],
        out_specs=(vmem, vmem, smem, smem, smem, smem),
        out_shape=(
            jax.ShapeDtypeStruct(w.shape, jnp.float32),
            jax.ShapeDtypeStruct(live_win.shape, jnp.float32),
            jax.ShapeDtypeStruct(scalars.shape, jnp.int32),
            jax.ShapeDtypeStruct((8,), jnp.int32),
            jax.ShapeDtypeStruct((d_pad,), jnp.int32),
            jax.ShapeDtypeStruct((d_pad,), jnp.int32),
        ),
        input_output_aliases={4: 0, 5: 1, 6: 2},
        scratch_shapes=[
            pltpu.VMEM((r_win, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(lens, ref_t_hbm, cols, jnp.eye(w_lane, dtype=jnp.float32), w, live_win, scalars)


@partial(
    jax.jit,
    static_argnames=("cfg", "k_block", "shared_ref", "interpret"),
    donate_argnames=("w", "live_win", "scalars"),
)
def _pallas_multi_insert_block_long(lens, ref_t_hbm, cols, w, live_win, scalars,
                                    cfg: OnlineConfig, k_block: int,
                                    shared_ref: bool = True, interpret: bool = False):
    """B concurrent LONG-REFERENCE streams per launch: Driver 3's grid over
    Driver 2b's O(c)-VMEM body.  The reference stays one (1|B, R, 128) HBM
    array shared by every grid step (each step DMAs its own stream's
    [j₀, j₀+r_win) window), per-stream VMEM state is the band window plus
    the sliding live window, and each stream's committed points come back
    in its (1, d_pad) delta row — hour-long concerts at serving batch
    sizes, with per-stream VMEM flat in N and in B (one stream's blocks
    resident per grid step).

    Returns (w', live_win', scalars', status (B,1,8), dx (B,1,d_pad),
    dy (B,1,d_pad))."""
    b = w.shape[0]
    if cols.shape[-1] < _LANES:
        cols = jnp.pad(cols, ((0, 0), (0, 0), (0, _LANES - cols.shape[-1])))
    c = cfg.c
    w_lane = _round_up(c + 1, _LANES)
    w_sub = _round_up(c + 1, _SUBLANES)
    l_win, l_pad, r_win, d_pad = _long_geometry(cfg, c, w_lane, k_block)
    assert live_win.shape == (b, l_pad, _LANES), live_win.shape
    kernel = _make_insert_kernel_long(cfg, c, w_sub, w_lane, k_block, l_win,
                                      r_win, batched=True, shared_ref=shared_ref)

    def _batched(arr, mem):
        return _squeezed_batch_spec(arr.shape[1:], mem)

    eye = jnp.eye(w_lane, dtype=jnp.float32)
    eye_spec = pl.BlockSpec(eye.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    vmem, smem = pltpu.VMEM, pltpu.SMEM
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            _batched(lens, smem),
            pl.BlockSpec(memory_space=pl.ANY),  # whole ref array; DMA per step
            _batched(cols, vmem),
            eye_spec,
            _batched(w, vmem),
            _batched(live_win, vmem),
            _batched(scalars, smem),
        ],
        out_specs=(
            _batched(w, vmem),
            _batched(live_win, vmem),
            _batched(scalars, smem),
            pl.BlockSpec((None, 1, 8), lambda i: (i, 0, 0), memory_space=smem),
            pl.BlockSpec((None, 1, d_pad), lambda i: (i, 0, 0), memory_space=smem),
            pl.BlockSpec((None, 1, d_pad), lambda i: (i, 0, 0), memory_space=smem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(w.shape, jnp.float32),
            jax.ShapeDtypeStruct(live_win.shape, jnp.float32),
            jax.ShapeDtypeStruct(scalars.shape, jnp.int32),
            jax.ShapeDtypeStruct((b, 1, 8), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, d_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, d_pad), jnp.int32),
        ),
        input_output_aliases={4: 0, 5: 1, 6: 2},
        scratch_shapes=[
            pltpu.VMEM((1, r_win, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(lens, ref_t_hbm, cols, eye, w, live_win, scalars)


# ---------------------------------------------------------------------------
# Driver 3: B concurrent streams, one launch per block (grid over streams)
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("cfg", "k_block", "shared_ref", "interpret"),
    donate_argnames=("w", "live_t", "path_x", "path_y", "scalars"),
)
def _pallas_multi_insert_block(lens, ref_t_pad, cols, w, live_t, path_x, path_y, scalars, cfg: OnlineConfig, k_block: int, shared_ref: bool = True, interpret: bool = False):
    """K streaming inserts for each of B independent streams in ONE launch.

    The serving analog of :func:`_pallas_insert_block`: a 1-D Pallas grid
    iterates the stream batch; every operand carries a leading batch axis
    whose BlockSpec dimension is ``None`` (squeezed), so each grid step sees
    exactly the solo kernel's ref shapes and the kernel body is REUSED
    verbatim — per-stream control flow (direction state machine, stop,
    capacity freeze) runs divergently per grid step, which vmapping the XLA
    engine cannot do without masking every branch.  Per-stream state is the
    O(c²) band-relative window + transposed live features (SURVEY.md §7 hard
    part 5) instead of the reference's dense (2N, N) acc matrices
    (otw_eran.py:23-27) — the memory fix that makes B≥256 streams/chip
    feasible.

    ``shared_ref=True``: all streams follow the same reference recording;
    ``ref_t_pad`` has batch size 1 and every grid step maps block 0 (the
    common serving case — one concert, many listeners — and it keeps H2D
    and HBM costs flat in B).  Otherwise ``ref_t_pad`` is (B, R, 128),
    zero-padded to a common length; each stream's true length in ``lens``
    drives its stop margin.

    Aliasing, scalar carries and the defensive state self-copy are exactly
    the solo driver's (see the CAUTION note at the top of this module).
    """
    b = w.shape[0]
    if cols.shape[-1] < _LANES:
        # narrow H2D column blocks, padded to the 128-lane layout on-device
        cols = jnp.pad(cols, ((0, 0), (0, 0), (0, _LANES - cols.shape[-1])))
    c = cfg.c
    w_lane = _round_up(c + 1, _LANES)
    w_sub = _round_up(c + 1, _SUBLANES)
    # SMEM operands arrive row-shaped — lens (B, 1, 4), paths (B, 1, P),
    # scalars (B, 1, 16), status (B, 1, 8) — because a squeezed-batch SMEM
    # block must keep its last two dims equal to the array's (Mosaic block-
    # mapping rule); the kernel indexes them with a leading 0 (batched=True)
    kernel = _make_insert_kernel(cfg, c, w_sub, w_lane, k_block, interpret, batched=True)

    def _batched(arr, mem):
        return _squeezed_batch_spec(arr.shape[1:], mem)

    ref_spec = pl.BlockSpec(
        (None, *ref_t_pad.shape[1:]),
        (lambda i: (0, 0, 0)) if shared_ref else (lambda i: (i, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    eye = jnp.eye(w_lane, dtype=jnp.float32)
    eye_spec = pl.BlockSpec(eye.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    vmem, smem = pltpu.VMEM, pltpu.SMEM
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            _batched(lens, smem),
            ref_spec,
            _batched(cols, vmem),
            eye_spec,
            _batched(w, vmem),
            _batched(live_t, vmem),
            _batched(path_x, smem),
            _batched(path_y, smem),
            _batched(scalars, smem),
        ],
        out_specs=(
            _batched(w, vmem),
            _batched(live_t, vmem),
            _batched(path_x, smem),
            _batched(path_y, smem),
            _batched(scalars, smem),
            pl.BlockSpec((None, 1, 8), lambda i: (i, 0, 0), memory_space=smem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(w.shape, jnp.float32),
            jax.ShapeDtypeStruct(live_t.shape, jnp.float32),
            jax.ShapeDtypeStruct(path_x.shape, jnp.int32),
            jax.ShapeDtypeStruct(path_y.shape, jnp.int32),
            jax.ShapeDtypeStruct(scalars.shape, jnp.int32),
            jax.ShapeDtypeStruct((b, 1, 8), jnp.int32),
        ),
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3, 8: 4},
        interpret=interpret,
    )(lens, ref_t_pad, cols, eye, w, live_t, path_x, path_y, scalars)
