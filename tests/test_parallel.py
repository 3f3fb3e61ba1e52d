"""Multi-chip paths on the 8-virtual-device CPU mesh (conftest)."""

import jax
import numpy as np
import pytest

from real_time_audio_sync_tpu.models import OnlineTimeWarping
from real_time_audio_sync_tpu.parallel import (
    batched_set_live,
    corpus_mesh,
    pad_pairs,
    sharded_chroma_frames,
)

from tests.test_online import _make_pair


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_pad_pairs_shapes():
    rng = np.random.default_rng(0)
    refs = [rng.random((12, n)) for n in (30, 45, 37)]
    lives = [rng.random((12, t)) for t in (50, 33, 61)]
    r, l, rl, ll = pad_pairs(refs, lives, pad_multiple=8)
    assert r.shape == (3, 12, 48) and l.shape == (3, 12, 64)
    assert list(rl) == [30, 45, 37] and list(ll) == [50, 33, 61]
    np.testing.assert_array_equal(r[0, :, :30], refs[0])
    assert np.all(r[0, :, 30:] == 0)


def test_batched_matches_single_engine():
    """Padded+vmapped batch alignment reproduces each pair's solo path."""
    rng = np.random.default_rng(3)
    pairs = [_make_pair(rng, n_ref=40 + 7 * i, stretch=1.2 + 0.1 * i) for i in range(4)]
    refs = [p[0] for p in pairs]
    lives = [p[1] for p in pairs]
    params = {"c": 10, "max_run_count": 3}

    solo_paths = []
    for ref, live in pairs:
        eng = OnlineTimeWarping(ref, params, dtype=np.float64)
        eng.set_live(live)
        solo_paths.append(eng.path_array)

    r, l, rl, ll = pad_pairs(refs, lives)
    batch_paths, mean_len = batched_set_live(r, l, rl, ll, params, dtype=np.float64)
    for got, want in zip(batch_paths, solo_paths):
        np.testing.assert_array_equal(got, want)
    assert float(mean_len) == pytest.approx(np.mean([len(p) for p in solo_paths]))


def test_batched_sharded_over_mesh():
    """Same result when the batch is sharded across all 8 devices."""
    rng = np.random.default_rng(4)
    pairs = [_make_pair(rng, n_ref=40, stretch=1.25) for _ in range(8)]
    refs = [p[0] for p in pairs]
    lives = [p[1] for p in pairs]
    params = {"c": 10, "max_run_count": 3}
    r, l, rl, ll = pad_pairs(refs, lives)

    plain, _ = batched_set_live(r, l, rl, ll, params, dtype=np.float64)
    mesh = corpus_mesh()
    sharded, mean_len = batched_set_live(r, l, rl, ll, params, mesh=mesh, dtype=np.float64)
    for got, want in zip(sharded, plain):
        np.testing.assert_array_equal(got, want)
    assert np.isfinite(float(mean_len))


def test_sharded_chroma_matches_single_device():
    from real_time_audio_sync_tpu.features.chroma import chroma_frames

    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    frames = rng.standard_normal((16, 4096))
    mesh = corpus_mesh()
    sharded = np.asarray(sharded_chroma_frames(frames, mesh, dtype=np.float64))
    single = np.asarray(chroma_frames(jnp.asarray(frames, jnp.float64)))
    np.testing.assert_allclose(sharded, single, rtol=1e-12, atol=1e-14)


def test_multistream_matches_solo_engines():
    """B concurrent streams (mixed reference lengths) through one vmapped
    dispatch per frame match each solo engine exactly."""
    from real_time_audio_sync_tpu.parallel.serving import MultiStreamFollower

    rng = np.random.default_rng(7)
    pairs = [_make_pair(rng, n_ref=30 + 9 * i, stretch=1.1 + 0.15 * i) for i in range(4)]
    refs = [p[0] for p in pairs]
    lives = [p[1] for p in pairs]
    params = {"c": 10, "max_run_count": 3}

    solo = []
    for ref, live in pairs:
        eng = OnlineTimeWarping(ref, params, dtype=np.float64)
        for i in range(live.shape[1]):
            if eng.insert(live[:, i]) == "stop":
                break
        solo.append(eng)

    ms = MultiStreamFollower(refs, params, dtype=np.float64)
    max_t = max(l.shape[1] for l in lives)
    for step in range(max_t):
        cols = np.zeros((4, 12))
        active = np.zeros(4, bool)
        for k, live in enumerate(lives):
            if step < live.shape[1]:
                cols[k] = live[:, step]
                active[k] = True
        ms.insert(cols, active)

    for k, eng in enumerate(solo):
        np.testing.assert_array_equal(ms.paths()[k], eng.path_array)
        assert bool(ms.stopped[k]) == bool(eng.state.stopped)


def test_multistream_sharded_over_mesh_matches_solo():
    """Serving sharded over the 8-device mesh (B/n_chips streams per chip,
    zero collectives): per-stream paths match the solo engines exactly."""
    from real_time_audio_sync_tpu.parallel import corpus_mesh
    from real_time_audio_sync_tpu.parallel.serving import MultiStreamFollower

    rng = np.random.default_rng(11)
    pairs = [_make_pair(rng, n_ref=28 + 3 * i, stretch=1.1 + 0.05 * i) for i in range(8)]
    refs = [p[0] for p in pairs]
    lives = [p[1] for p in pairs]
    params = {"c": 10, "max_run_count": 3}

    solo = []
    for ref, live in pairs:
        eng = OnlineTimeWarping(ref, params, dtype=np.float64)
        for i in range(live.shape[1]):
            if eng.insert(live[:, i]) == "stop":
                break
        solo.append(eng)

    mesh = corpus_mesh()
    ms = MultiStreamFollower(refs, params, dtype=np.float64, mesh=mesh)
    # one stream group per device
    assert len(set(d for s in jax.tree.leaves(ms.states) for d in s.sharding.device_set)) == 8
    max_t = max(l.shape[1] for l in lives)
    for step in range(max_t):
        cols = np.zeros((8, 12))
        active = np.zeros(8, bool)
        for k, live in enumerate(lives):
            if step < live.shape[1]:
                cols[k] = live[:, step]
                active[k] = True
        ms.insert(cols, active)

    for k, eng in enumerate(solo):
        np.testing.assert_array_equal(ms.paths()[k], eng.path_array)
        assert bool(ms.stopped[k]) == bool(eng.state.stopped)


def test_multistream_multi_axis_mesh_shards_fully():
    """A 2-D mesh partitions the stream batch by the FULL device count (a
    single-axis spec would silently replicate across the second axis)."""
    from jax.sharding import Mesh
    from real_time_audio_sync_tpu.parallel.serving import MultiStreamFollower

    rng = np.random.default_rng(13)
    refs = [_make_pair(rng, n_ref=24)[0] for _ in range(8)]
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("x", "y"))
    ms = MultiStreamFollower(refs, {"c": 10, "max_run_count": 3}, mesh=mesh)
    shard_shape = ms.states.acc.sharding.shard_shape(ms.states.acc.shape)
    assert shard_shape[0] == 1  # one stream per device, not 4x replication
    lives = [_make_pair(rng, n_ref=24)[1] for _ in range(8)]
    for step in range(10):
        cols = np.stack([lv[:, step] for lv in lives])
        ms.insert(cols)
    t_ptrs, _ = ms.pointers()
    assert (t_ptrs == 9).all()


def test_multistream_mesh_requires_divisible_batch():
    from real_time_audio_sync_tpu.parallel import corpus_mesh
    from real_time_audio_sync_tpu.parallel.serving import MultiStreamFollower

    rng = np.random.default_rng(12)
    refs = [_make_pair(rng, n_ref=30)[0] for _ in range(3)]
    with pytest.raises(ValueError, match="divisible"):
        MultiStreamFollower(refs, {"c": 10, "max_run_count": 3}, mesh=corpus_mesh())
