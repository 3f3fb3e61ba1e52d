"""Fused Pallas alignment kernel vs the XLA engine (interpret mode on CPU)."""

import numpy as np
import pytest

from real_time_audio_sync_tpu.models import LiveNote, LiveNoteV2, OnlineTimeWarping

from tests.test_online import _make_pair


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


PARAMS = {"c": 10, "max_run_count": 3}


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_otw_matches_xla_engine(seed):
    from real_time_audio_sync_tpu.ops.pallas_otw import pallas_set_live

    rng = np.random.default_rng(seed)
    ref, live = _make_pair(rng, n_ref=48, stretch=1.25)
    xla = OnlineTimeWarping(ref, PARAMS, dtype=np.float32)
    xla.set_live(live)

    path, t, j, stopped = pallas_set_live(ref, live, PARAMS)
    np.testing.assert_array_equal(path, xla.path_array)
    assert t == xla.live_ptr
    assert j == xla.ref_ptr


def test_pallas_livenote_variant():
    from real_time_audio_sync_tpu.ops.pallas_otw import pallas_set_live

    rng = np.random.default_rng(2)
    ref, live = _make_pair(rng, n_ref=40)
    xla = LiveNote(ref, {"search_band_width": 10, "max_run_count": 3}, dtype=np.float32)
    xla.set_live(live)
    path, t, j, stopped = pallas_set_live(
        ref, live, PARAMS, sentinel=float("inf"), run_count_init=0
    )
    np.testing.assert_array_equal(path, xla.path_array)


def test_pallas_v2_monotone_euclidean():
    from real_time_audio_sync_tpu.ops.pallas_otw import pallas_set_live

    rng = np.random.default_rng(3)
    ref, live = _make_pair(rng, n_ref=40)
    ref_d = np.clip(np.diff(ref, axis=1), 0, np.inf)
    live_d = np.clip(np.diff(live, axis=1), 0, np.inf)
    xla = LiveNoteV2(
        ref_d, {"search_band_width": 10, "max_run_count": 3}, chroma_diff=True, dtype=np.float32
    )
    xla.set_live(live_d)
    path, t, j, stopped = pallas_set_live(
        ref_d, live_d, PARAMS,
        sentinel=float("inf"), run_count_init=0, monotone_path=True, euclidean=True,
    )
    np.testing.assert_array_equal(path, xla.path_array)


def test_pallas_wide_band_crosses_lane_tile():
    """c > 127 makes the window span multiple 128-lane tiles (w_lane=256);
    the static rolls/masks must stay exact across the tile boundary."""
    from real_time_audio_sync_tpu.ops.pallas_otw import pallas_set_live

    rng = np.random.default_rng(6)
    ref, live = _make_pair(rng, n_ref=150, stretch=1.2)
    params = {"c": 130, "max_run_count": 3}
    xla = OnlineTimeWarping(ref, params, dtype=np.float32)
    xla.set_live(live)
    path, t, j, stopped = pallas_set_live(ref, live, params)
    np.testing.assert_array_equal(path, xla.path_array)


def test_pallas_ref_exhaustion_stop():
    from real_time_audio_sync_tpu.ops.pallas_otw import pallas_set_live

    rng = np.random.default_rng(4)
    ref, live = _make_pair(rng, n_ref=32, stretch=1.0)
    extra = rng.random((12, 30))
    extra /= np.linalg.norm(extra, axis=0, keepdims=True)
    live = np.concatenate([live, extra], axis=1)
    xla = OnlineTimeWarping(ref, PARAMS, dtype=np.float32)
    xla.set_live(live)
    path, t, j, stopped = pallas_set_live(ref, live, PARAMS)
    np.testing.assert_array_equal(path, xla.path_array)
    assert stopped == (j >= ref.shape[1])


def test_pallas_batched_set_live_matches_solo():
    """One-launch batched corpus alignment (grid over pairs, O(c²) scratch)
    == per-pair pallas_set_live, ragged lengths + early per-pair exits."""
    from real_time_audio_sync_tpu.ops.pallas_otw import (
        pallas_batched_set_live,
        pallas_set_live,
    )
    from tests.test_online import _make_pair

    rng = np.random.default_rng(5)
    pairs = [_make_pair(rng, n_ref=24 + 6 * i, stretch=1.0 + 0.15 * i) for i in range(4)]
    params = {"c": 10, "max_run_count": 3}
    solo = [pallas_set_live(r, l, params) for r, l in pairs]
    batched = pallas_batched_set_live(
        [r for r, _ in pairs], [l for _, l in pairs], params, interpret=True
    )
    for (bp, bt, bj, bs), (sp, st, sj, ss) in zip(batched, solo):
        np.testing.assert_array_equal(bp, sp)
        assert (bt, bj, bs) == (st, sj, ss)


def test_pallas_batched_set_live_shared_ref():
    from real_time_audio_sync_tpu.ops.pallas_otw import (
        pallas_batched_set_live,
        pallas_set_live,
    )
    from tests.test_online import _make_pair

    rng = np.random.default_rng(6)
    ref, live = _make_pair(rng, n_ref=32, stretch=1.25)
    params = {"c": 10, "max_run_count": 3}
    sp, st, sj, ss = pallas_set_live(ref, live, params)
    batched = pallas_batched_set_live([ref] * 3, [live] * 3, params, interpret=True)
    for bp, bt, bj, bs in batched:
        np.testing.assert_array_equal(bp, sp)
        assert (bt, bj, bs) == (st, sj, ss)


@pytest.mark.parametrize("seed,stretch,overrides", [
    (31, 1.25, {}),  # otw, live exhausted without stop
    (33, 2.6, {}),   # otw, early stop (live much longer than ref)
    (32, 1.25, dict(sentinel=float("inf"), run_count_init=0)),  # livenote
    (2, 1.25, dict(sentinel=float("inf"), run_count_init=0,
                   monotone_path=True, euclidean=True)),  # livenote_v2
    # (monotone guard; seed 2 is a case where naive [(0,0)]+insert does NOT
    # equal set_live, so the seeded-scalar delegation is what is proven)
])
def test_set_live_long_pair_delegation(monkeypatch, seed, stretch, overrides):
    """Hour-scale pairs delegate pallas_set_live to the long-reference
    streaming engine with the identical committed path and pointer tuple
    (forced here via the threshold on a small pair), across all engine
    configs including the V2 monotone guard."""
    import real_time_audio_sync_tpu.ops.pallas_otw as po
    from tests.test_online import _make_pair

    rng = np.random.default_rng(seed)
    ref, live = _make_pair(rng, n_ref=48, stretch=stretch)
    params = {"c": 10, "max_run_count": 3}
    direct = po.pallas_set_live(ref, live, params, **overrides)
    monkeypatch.setattr(po, "_SET_LIVE_LONG_N", 0)
    delegated = po.pallas_set_live(ref, live, params, **overrides)
    np.testing.assert_array_equal(delegated[0], direct[0])
    assert delegated[1:] == direct[1:]


def test_batched_set_live_long_pair_delegation(monkeypatch):
    """Hour-scale batches delegate pallas_batched_set_live per pair (the
    batched kernel's whole-sequence VMEM layout scales with the PADDED
    lengths), preserving the exact per-pair pallas_set_live contract."""
    import real_time_audio_sync_tpu.ops.pallas_otw as po
    from tests.test_online import _make_pair

    rng = np.random.default_rng(7)
    pairs = [_make_pair(rng, n_ref=32 + 8 * i, stretch=1.0 + 0.2 * i)
             for i in range(3)]
    params = {"c": 10, "max_run_count": 3}
    direct = [po.pallas_set_live(r, l, params) for r, l in pairs]
    monkeypatch.setattr(po, "_SET_LIVE_LONG_N", 0)
    delegated = po.pallas_batched_set_live(
        [r for r, _ in pairs], [l for _, l in pairs], params)
    for want, got in zip(direct, delegated):
        np.testing.assert_array_equal(got[0], want[0])
        assert got[1:] == want[1:]
