"""Fused streaming engine (persistent-state Pallas inserts) vs the XLA
engine — interpret mode on CPU; hardware parity in tests/test_tpu_hardware.py."""

import numpy as np
import pytest

from real_time_audio_sync_tpu.models import OnlineTimeWarping
from real_time_audio_sync_tpu.models.fused_streaming import FusedStreamingEngine

from tests.test_online import _make_pair, _unit_cols


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


PARAMS = {"c": 10, "max_run_count": 3}


@pytest.mark.parametrize("seed,block,k_block", [
    (0, 8, 8), (1, 1, 8), (2, 5, 8),
    (3, 1, 1),  # per-frame engine program (bench diagnostic 3)
    (4, 5, 2),  # oversize feeds split across k_block=2 launches
])
def test_fused_streaming_matches_xla_engine(seed, block, k_block):
    rng = np.random.default_rng(seed)
    ref, live = _make_pair(rng, n_ref=48, stretch=1.25)
    xla = OnlineTimeWarping(ref, PARAMS, dtype=np.float32)
    for i in range(live.shape[1]):
        if xla.insert(live[:, i]) == "stop":
            break

    fused = FusedStreamingEngine(ref, PARAMS, k_block=k_block, interpret=True)
    for s in range(0, live.shape[1], block):
        fused.insert_block_nowait(live[:, s : s + block])
    fused.flush()
    np.testing.assert_array_equal(fused.path_array, xla.path_array)


def test_fused_streaming_stop_and_freeze():
    rng = np.random.default_rng(4)
    ref, live = _make_pair(rng, n_ref=32, stretch=1.0)
    extra = _unit_cols(rng.random((12, 30)) + 0.05)
    live = np.concatenate([live, extra], axis=1)

    xla = OnlineTimeWarping(ref, PARAMS, dtype=np.float32)
    for i in range(live.shape[1]):
        if xla.insert(live[:, i]) == "stop":
            break

    fused = FusedStreamingEngine(ref, PARAMS, k_block=8, interpret=True)
    for s in range(0, live.shape[1], 8):
        fused.insert_block_nowait(live[:, s : s + 8])
    assert fused.flush() == "stop"
    assert fused.insert_block_nowait(live[:, :8]) == "stop"  # cached verdict
    np.testing.assert_array_equal(fused.path_array, xla.path_array)
    plen, x, y = fused.last_point
    assert plen == len(fused.path)
    assert (x, y) == tuple(fused.path[-1])


@pytest.mark.parametrize("c,mrc", [(3, 3), (10, 1), (25, 5)])
def test_fused_streaming_config_sweep(c, mrc):
    """Band-width / slope-constraint sweep through the persistent-state
    streaming kernel (incl. the forced-alternation edge max_run_count=1)."""
    rng = np.random.default_rng(200 + c + mrc)
    ref, live = _make_pair(rng, n_ref=40, stretch=1.3)
    params = {"c": c, "max_run_count": mrc}
    xla = OnlineTimeWarping(ref, params, dtype=np.float32)
    for i in range(live.shape[1]):
        if xla.insert(live[:, i]) == "stop":
            break
    fused = FusedStreamingEngine(ref, params, k_block=8, interpret=True)
    for s in range(0, live.shape[1], 8):
        fused.insert_block_nowait(live[:, s : s + 8])
    fused.flush()
    np.testing.assert_array_equal(fused.path_array, xla.path_array)


def test_fused_streaming_capacity_freeze():
    """Live-buffer capacity exhaustion (otw_eran.py:50-54 "ran out of room"):
    t keeps incrementing with no further evaluation — fused matches XLA on a
    stream longer than the 2N live capacity."""
    rng = np.random.default_rng(31)
    ref = _unit_cols(rng.random((12, 30)) + 0.05)
    # adversarial live: unrelated content, longer than the 2N capacity
    live = _unit_cols(rng.random((12, 75)) + 0.05)
    params = {"c": 10, "max_run_count": 3}
    xla = OnlineTimeWarping(ref, params, dtype=np.float32)
    stopped = None
    for i in range(live.shape[1]):
        if xla.insert(live[:, i]) == "stop":
            stopped = i
            break
    fused = FusedStreamingEngine(ref, params, k_block=8, interpret=True)
    for s in range(0, live.shape[1], 8):
        fused.insert_block_nowait(live[:, s : s + 8])
    status = fused.flush()
    np.testing.assert_array_equal(fused.path_array, xla.path_array)
    assert (status == "stop") == bool(np.asarray(xla.state.stopped))


def test_fused_streaming_livenote_v2_variant():
    rng = np.random.default_rng(5)
    ref, live = _make_pair(rng, n_ref=40)
    ref_d = np.clip(np.diff(ref, axis=1), 0, np.inf)
    live_d = np.clip(np.diff(live, axis=1), 0, np.inf)
    from real_time_audio_sync_tpu.models import LiveNoteV2

    xla = LiveNoteV2(
        ref_d, {"search_band_width": 10, "max_run_count": 3}, chroma_diff=True, dtype=np.float32
    )
    for i in range(live_d.shape[1]):
        if xla.insert(live_d[:, i]) == "stop":
            break
    fused = FusedStreamingEngine(
        ref_d, PARAMS, interpret=True,
        cfg_overrides=dict(sentinel=float("inf"), run_count_init=0, monotone_path=True, euclidean=True),
    )
    for s in range(0, live_d.shape[1], 8):
        fused.insert_block_nowait(live_d[:, s : s + 8])
    fused.flush()
    np.testing.assert_array_equal(fused.path_array, xla.path_array)


@pytest.mark.parametrize("max_in_flight", [0, 2, 1000])
def test_adaptive_feed_matches_sync_path(max_in_flight):
    """feed() (adaptive dispatch coalescing) commits exactly the synchronous
    per-frame path regardless of how frames coalesce into launches:
    max_in_flight=0 forces maximal coalescing (every dispatch held until the
    4*k_block liveness cap), 1000 forces a dispatch per frame, 2 is the
    production regime."""
    rng = np.random.default_rng(7)
    ref, live = _make_pair(rng, n_ref=48, stretch=1.25)
    xla = OnlineTimeWarping(ref, PARAMS, dtype=np.float32)
    for i in range(live.shape[1]):
        if xla.insert(live[:, i]) == "stop":
            break

    fused = FusedStreamingEngine(ref, PARAMS, k_block=8, interpret=True)
    fused.max_in_flight = max_in_flight
    for i in range(live.shape[1]):
        if fused.feed(live[:, i]) == "stop":
            break
    fused.flush()
    np.testing.assert_array_equal(fused.path_array, xla.path_array)
    if max_in_flight == 0:
        # saturated pipeline: multi-frame launches actually happened
        assert max(fused.dispatched_block_sizes, default=1) == 8
    if max_in_flight == 1000:
        # open pipeline: every frame dispatched the moment it arrived
        assert all(k == 1 for k in fused.dispatched_block_sizes)


def test_feed_never_buffers_when_pipeline_open():
    """At real-time pacing (pipeline drained between hops) feed() must
    dispatch every frame immediately — zero added input latency."""
    import jax

    rng = np.random.default_rng(8)
    ref, live = _make_pair(rng, n_ref=32, stretch=1.0)
    fused = FusedStreamingEngine(ref, PARAMS, k_block=8, interpret=True)
    for i in range(min(20, live.shape[1])):
        fused.feed(live[:, i])
        assert len(fused._pending) == 0
        jax.block_until_ready(fused._state)  # device idle before next hop


def test_staleness_accounting():
    """Status harvests record how many frames ran ahead of the harvested
    position; a blocking flush always brings staleness to zero."""
    rng = np.random.default_rng(9)
    ref, live = _make_pair(rng, n_ref=48, stretch=1.0)
    fused = FusedStreamingEngine(ref, PARAMS, k_block=8, interpret=True)
    fused.poll_min_interval = 0.0  # harvest as often as completion allows
    n = live.shape[1]
    for i in range(n):
        if fused.feed(live[:, i]) == "stop":
            break
    fused.flush()
    assert fused.last_point_age_frames == 0
    assert fused.staleness_log, "harvests must be recorded"
    assert all(0 <= s <= fused._frames_dispatched for s in fused.staleness_log)
    # the final (flush) harvest covers every dispatched frame
    assert fused.staleness_log[-1] == 0


def test_in_flight_probes_are_consistent():
    import jax

    rng = np.random.default_rng(10)
    ref, live = _make_pair(rng, n_ref=32, stretch=1.0)
    fused = FusedStreamingEngine(ref, PARAMS, k_block=4, interpret=True)
    for s in range(0, 16, 4):
        fused.insert_block_nowait(live[:, s : s + 4])
    jax.block_until_ready([st for _, st in fused._outstanding])
    assert fused.in_flight() == 0
    assert fused.flush() is None or fused.flush() == "stop"


# ---------------------------------------------------------------------------
# Long-reference mode (ops/pallas_otw.py Driver 2b): O(c)-VMEM streaming with
# HBM ref window, sliding live window and host-accumulated path deltas
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed,block,k_block,stack", [
    (0, 8, 8, 4),   # block streaming + delta folding
    (1, 1, 8, 64),  # per-frame inserts, unfolded drain
    (2, 1, 1, 2),   # per-frame engine program
    (3, 5, 2, 3),   # oversize feeds split across launches
])
def test_long_ref_matches_xla_engine(seed, block, k_block, stack, monkeypatch):
    import real_time_audio_sync_tpu.models.fused_streaming as fs

    monkeypatch.setattr(fs, "_DELTA_STACK", stack)
    rng = np.random.default_rng(seed)
    ref, live = _make_pair(rng, n_ref=48, stretch=1.25)
    xla = OnlineTimeWarping(ref, PARAMS, dtype=np.float32)
    for i in range(live.shape[1]):
        if xla.insert(live[:, i]) == "stop":
            break

    eng = FusedStreamingEngine(ref, PARAMS, k_block=k_block, interpret=True,
                               long_ref=True)
    assert eng.long_ref
    for s in range(0, live.shape[1], block):
        eng.insert_block_nowait(live[:, s : s + block])
    eng.flush()
    np.testing.assert_array_equal(eng.path_array, xla.path_array)


def test_long_ref_feed_and_periodic_drains():
    """Adaptive feed through the long kernel, with mid-stream path reads
    (delta drains) that must not lose or duplicate committed points."""
    rng = np.random.default_rng(7)
    ref, live = _make_pair(rng, n_ref=48, stretch=1.25)
    xla = OnlineTimeWarping(ref, PARAMS, dtype=np.float32)
    for i in range(live.shape[1]):
        if xla.insert(live[:, i]) == "stop":
            break

    eng = FusedStreamingEngine(ref, PARAMS, k_block=8, interpret=True,
                               long_ref=True)
    for i in range(live.shape[1]):
        eng.feed(live[:, i])
        if i % 16 == 0:
            eng.flush()
            _ = eng.path_array  # mid-stream drain
    eng.flush()
    np.testing.assert_array_equal(eng.path_array, xla.path_array)


def test_long_ref_stop_and_freeze():
    rng = np.random.default_rng(4)
    ref, live = _make_pair(rng, n_ref=32, stretch=1.0)
    extra = _unit_cols(rng.random((12, 30)) + 0.05)
    live = np.concatenate([live, extra], axis=1)

    xla = OnlineTimeWarping(ref, PARAMS, dtype=np.float32)
    for i in range(live.shape[1]):
        if xla.insert(live[:, i]) == "stop":
            break

    eng = FusedStreamingEngine(ref, PARAMS, k_block=8, interpret=True,
                               long_ref=True)
    for s in range(0, live.shape[1], 8):
        eng.insert_block_nowait(live[:, s : s + 8])
    assert eng.flush() == "stop"
    assert eng.insert_block_nowait(live[:, :8]) == "stop"
    np.testing.assert_array_equal(eng.path_array, xla.path_array)


def test_long_ref_checkpoint_resume():
    """Mid-stream snapshot/restore of the long engine continues bit-exactly
    (sliding live window + host path travel through the checkpoint)."""
    from real_time_audio_sync_tpu.utils.checkpoint import (
        load_fused_state,
        save_fused_state,
    )

    rng = np.random.default_rng(9)
    ref, live = _make_pair(rng, n_ref=48, stretch=1.25)
    xla = OnlineTimeWarping(ref, PARAMS, dtype=np.float32)
    for i in range(live.shape[1]):
        if xla.insert(live[:, i]) == "stop":
            break

    import tempfile, os

    eng = FusedStreamingEngine(ref, PARAMS, k_block=8, interpret=True,
                               long_ref=True)
    cut = (live.shape[1] // 2) // 8 * 8
    for s in range(0, cut, 8):
        eng.insert_block_nowait(live[:, s : s + 8])
    with tempfile.TemporaryDirectory() as td:
        ck = os.path.join(td, "ck.npz")
        save_fused_state(eng, ck)
        res = FusedStreamingEngine(ref, PARAMS, k_block=8, interpret=True,
                                   long_ref=True)
        load_fused_state(res, ck)
        for s in range(cut, live.shape[1], 8):
            res.insert_block_nowait(live[:, s : s + 8])
        res.flush()
        # mode mismatch is rejected explicitly
        std = FusedStreamingEngine(ref, PARAMS, k_block=8, interpret=True,
                                   long_ref=False)
        with pytest.raises(ValueError, match="long_ref"):
            load_fused_state(std, ck)
    np.testing.assert_array_equal(res.path_array, xla.path_array)


def test_long_ref_livenote_v2_variant():
    """The long kernel honors the LiveNoteV2 config (monotone path guard +
    Euclidean chroma-diff cost); skipped appends mean zero-commit launches,
    which the delta drain must pass over without losing alignment."""
    rng = np.random.default_rng(5)
    ref, live = _make_pair(rng, n_ref=40)
    ref_d = np.clip(np.diff(ref, axis=1), 0, np.inf)
    live_d = np.clip(np.diff(live, axis=1), 0, np.inf)
    from real_time_audio_sync_tpu.models import LiveNoteV2

    xla = LiveNoteV2(
        ref_d, {"search_band_width": 10, "max_run_count": 3}, chroma_diff=True, dtype=np.float32
    )
    for i in range(live_d.shape[1]):
        if xla.insert(live_d[:, i]) == "stop":
            break
    eng = FusedStreamingEngine(
        ref_d, PARAMS, interpret=True, long_ref=True,
        cfg_overrides=dict(sentinel=float("inf"), run_count_init=0, monotone_path=True, euclidean=True),
    )
    for s in range(0, live_d.shape[1], 8):
        eng.insert_block_nowait(live_d[:, s : s + 8])
    eng.flush()
    np.testing.assert_array_equal(eng.path_array, xla.path_array)


def test_delta_fold_iter_roundtrip():
    """fold_delta_tail + iter_delta_rows reconstruct every launch's
    [status | dx | dy] row in dispatch order, for solo (1-D) and
    multi-stream (B,1,X) component shapes and any fold boundary."""
    import jax.numpy as jnp

    from real_time_audio_sync_tpu.models.fused_streaming import (
        fold_delta_tail,
        iter_delta_rows,
    )

    rng = np.random.default_rng(40)
    d_pad = 5

    def launch(i, shape_prefix=()):
        st = jnp.asarray(rng.integers(0, 99, size=(*shape_prefix, 8), dtype=np.int32) + 1000 * i)
        dx = jnp.asarray(rng.integers(0, 99, size=(*shape_prefix, d_pad), dtype=np.int32))
        dy = jnp.asarray(rng.integers(0, 99, size=(*shape_prefix, d_pad), dtype=np.int32))
        return st, dx, dy

    for prefix in ((), (3, 1)):  # solo rows / B=3 row-shaped
        launches = [launch(i, prefix) for i in range(11)]
        want = [np.concatenate([np.asarray(a) for a in t], axis=-1) for t in launches]
        deltas = []
        for t in launches:
            deltas.append(t)
            fold_delta_tail(deltas, 4)  # folds at every 4 pending tuples
        assert any(not isinstance(d, tuple) for d in deltas)  # folding happened
        got = [row for rows in iter_delta_rows(deltas) for row in rows]
        assert not deltas  # drained
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)


def test_checkpoint_flushes_pending_feed_frames(tmp_path):
    """save_fused_state must not lose feed()'s coalesce-pending columns
    (round-3 review finding): a saturated engine holds undispatched frames
    in the host-side queue, so the snapshot flushes them first and a
    restore clears the (already-snapshotted) queue."""
    from real_time_audio_sync_tpu.utils.checkpoint import (
        load_fused_state,
        save_fused_state,
    )

    rng = np.random.default_rng(13)
    ref, live = _make_pair(rng, n_ref=48, stretch=1.25)
    xla = OnlineTimeWarping(ref, PARAMS, dtype=np.float32)
    for i in range(live.shape[1]):
        if xla.insert(live[:, i]) == "stop":
            break

    eng = FusedStreamingEngine(ref, PARAMS, k_block=8, interpret=True)
    eng.max_in_flight = 0  # saturate the pipeline: feed() only queues
    cut = min(live.shape[1] // 2, 4 * 8 - 1)  # below the liveness backstop
    for i in range(cut):
        eng.feed(live[:, i])
    assert eng._pending  # the hazard: columns still host-side

    ck = str(tmp_path / "pending.npz")
    save_fused_state(eng, ck)
    res = FusedStreamingEngine(ref, PARAMS, k_block=8, interpret=True)
    load_fused_state(res, ck)
    assert not res._pending
    for i in range(cut, live.shape[1]):
        res.feed(live[:, i])
    res.flush()
    np.testing.assert_array_equal(res.path_array, xla.path_array)


@pytest.mark.parametrize("seed,long_ref", [(51, False), (52, True)])
def test_fused_api_interleaving_fuzz(seed, long_ref):
    """Seeded fuzz over random interleavings of the fused engine's API
    (feed / insert_nowait / insert_block_nowait / poll / last_point /
    mid-stream path reads) under maximum harvest pressure: committed paths
    must equal the XLA engine's synchronous run in both kernel modes."""
    rng = np.random.default_rng(seed)
    ref, live = _make_pair(rng, n_ref=48, stretch=1.25)
    extra = _unit_cols(rng.random((12, 30)) + 0.05)
    live = np.concatenate([live, extra], axis=1).astype(np.float32)

    sync = OnlineTimeWarping(ref, PARAMS, dtype=np.float32)
    for i in range(live.shape[1]):
        if sync.insert(live[:, i]) == "stop":
            break

    eng = FusedStreamingEngine(ref, PARAMS, k_block=4, interpret=True,
                               long_ref=long_ref)
    eng.poll_min_interval = 0.0
    i, r = 0, None
    while i < live.shape[1] and r != "stop":
        op = int(rng.integers(0, 5))
        if op == 0:
            r = eng.feed(live[:, i]); i += 1
        elif op == 1:
            r = eng.insert_nowait(live[:, i]); i += 1
        elif op == 2:
            k = min(int(rng.integers(1, 6)), live.shape[1] - i)
            r = eng.insert_block_nowait(live[:, i : i + k]); i += k
        elif op == 3:
            r = eng.poll()
        else:
            _ = eng.last_point, eng.last_point_age_frames
            if long_ref and rng.integers(0, 2):
                _ = eng.path_array  # mid-stream delta drain
            r = None
    eng.flush()
    np.testing.assert_array_equal(eng.path_array, sync.path_array)
    plen, x, y = eng.last_point
    assert plen == len(eng.path)
    assert (x, y) == tuple(eng.path[-1])


def test_block_api_preserves_feed_queue_order():
    """insert_block_nowait after feed() under a saturated pipeline must
    dispatch the queued feed frames FIRST — mixing the two APIs must not
    reorder the stream."""
    rng = np.random.default_rng(53)
    ref, live = _make_pair(rng, n_ref=48, stretch=1.25)
    live = live.astype(np.float32)

    sync = OnlineTimeWarping(ref, PARAMS, dtype=np.float32)
    for i in range(live.shape[1]):
        if sync.insert(live[:, i]) == "stop":
            break

    eng = FusedStreamingEngine(ref, PARAMS, k_block=8, interpret=True)
    eng.max_in_flight = 0  # saturate: feed() only queues
    for i in range(10):
        eng.feed(live[:, i])
    assert eng._pending
    eng.insert_block_nowait(live[:, 10:20])
    assert not eng._pending
    for i in range(20, live.shape[1]):
        eng.insert_nowait(live[:, i])
    eng.flush()
    np.testing.assert_array_equal(eng.path_array, sync.path_array)


def test_feed_copies_queued_columns():
    """Regression: under saturation feed()'s column stays QUEUED past the
    call, so a caller reusing one buffer per hop (the natural streaming
    loop) must not mutate the queued entry — feed copies on ingest."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(41)
    ref, live = _make_pair(rng, n_ref=40, stretch=1.2)
    cut = min(live.shape[1], 4 * 8 - 1)  # below the liveness backstop

    with pltpu.force_tpu_interpret_mode():
        fresh = FusedStreamingEngine(ref, PARAMS, k_block=8, interpret=True)
        fresh.max_in_flight = 0  # saturate: feed() only queues
        for i in range(cut):
            fresh.feed(live[:, i])
        fresh.flush()

        reused = FusedStreamingEngine(ref, PARAMS, k_block=8, interpret=True)
        reused.max_in_flight = 0
        buf = np.zeros(live.shape[0], np.float32)
        for i in range(cut):
            buf[:] = live[:, i]  # caller reuses ONE buffer per hop
            reused.feed(buf)
        buf[:] = -1.0  # and clobbers it after the last hop
        reused.flush()

    assert [tuple(p) for p in reused.path] == [tuple(p) for p in fresh.path]
