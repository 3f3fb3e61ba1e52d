"""Parity: fused Pallas wavefront sweep vs the lax.scan wavefront.

Runs the kernel in interpreter mode on CPU (conftest forces the CPU
platform); the same comparison passes bit-exactly on real TPU hardware —
re-verified each round by bench.py's offline-DTW diagnostic and the
.scratch TPU probes (acc bit-equal, back codes equal, at 401x380, 100x100
and 1900x1900 for both step specs).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from real_time_audio_sync_tpu.ops.pallas_wavefront import wavefront_dp_pallas
from real_time_audio_sync_tpu.ops.wavefront import DTW_SPEC, WTW_SPEC, backtrack, wavefront_dp


@pytest.mark.parametrize("spec", [DTW_SPEC, WTW_SPEC], ids=["dtw", "wtw"])
@pytest.mark.parametrize("shape", [(5, 7), (33, 20), (40, 65)])
def test_pallas_wavefront_matches_scan(spec, shape):
    rng = np.random.default_rng(sum(shape))
    cost = jnp.asarray(rng.random(shape), jnp.float32)
    acc_s, back_s = wavefront_dp(cost, spec)
    acc_p, back_p = wavefront_dp_pallas(cost, spec, interpret=True)
    np.testing.assert_array_equal(np.asarray(acc_s), np.asarray(acc_p))
    np.testing.assert_array_equal(np.asarray(back_s), np.asarray(back_p))


@pytest.mark.parametrize("spec", [DTW_SPEC, WTW_SPEC], ids=["dtw", "wtw"])
def test_pallas_wavefront_ties_break_like_np_argmin(spec):
    """Constant costs force ties on every cell — the strict-< chain must
    reproduce np.argmin's first-min order exactly (back codes equal)."""
    cost = jnp.ones((12, 9), jnp.float32)
    _, back_s = wavefront_dp(cost, spec)
    _, back_p = wavefront_dp_pallas(cost, spec, interpret=True)
    np.testing.assert_array_equal(np.asarray(back_s), np.asarray(back_p))


def test_pallas_backtracked_path_matches():
    rng = np.random.default_rng(3)
    cost = jnp.asarray(rng.random((21, 30)), jnp.float32)
    _, back_s = wavefront_dp(cost, DTW_SPEC)
    _, back_p = wavefront_dp_pallas(cost, DTW_SPEC, interpret=True)
    pts_s, len_s = backtrack(back_s, DTW_SPEC)
    pts_p, len_p = backtrack(back_p, DTW_SPEC)
    assert int(len_s) == int(len_p)
    np.testing.assert_array_equal(
        np.asarray(pts_s)[: int(len_s)], np.asarray(pts_p)[: int(len_p)]
    )


@pytest.mark.parametrize("spec", [DTW_SPEC, WTW_SPEC], ids=["dtw", "wtw"])
@pytest.mark.parametrize("shape", [(5, 7), (21, 30), (40, 65)])
def test_pallas_backtrack_kernel_matches_scan(spec, shape):
    """backtrack_pallas reproduces the scan backtrack's full output contract:
    identical valid path, identical length, identical frozen repeats."""
    from real_time_audio_sync_tpu.ops.pallas_wavefront import backtrack_pallas

    rng = np.random.default_rng(sum(shape))
    cost = jnp.asarray(rng.random(shape), jnp.float32)
    _, back = wavefront_dp(cost, spec)
    pts_s, len_s = backtrack(back, spec)
    pts_p, len_p = backtrack_pallas(back, spec, interpret=True)
    assert int(len_s) == int(len_p)
    np.testing.assert_array_equal(np.asarray(pts_s), np.asarray(pts_p))
