"""Fused Pallas chroma kernel vs the reference XLA path (interpret mode on
CPU; the real-TPU comparison runs in bench/verification)."""

import jax
import numpy as np
import pytest

from real_time_audio_sync_tpu.features.chroma import chroma_frames


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def test_fused_matches_xla_path():
    from real_time_audio_sync_tpu.features.kernels import chroma_frames_fused

    rng = np.random.default_rng(0)
    frames = rng.standard_normal((24, 4096)).astype(np.float32) * 0.1
    fused = np.asarray(chroma_frames_fused(frames))
    import jax.numpy as jnp

    plain = np.asarray(chroma_frames(jnp.asarray(frames)))
    assert fused.shape == plain.shape == (12, 24)
    np.testing.assert_allclose(fused, plain, atol=2e-5, rtol=1e-4)


def test_fused_handles_nonmultiple_frame_count():
    from real_time_audio_sync_tpu.features.kernels import chroma_frames_fused

    rng = np.random.default_rng(1)
    frames = rng.standard_normal((5, 4096)).astype(np.float32)
    out = np.asarray(chroma_frames_fused(frames))
    assert out.shape == (12, 5)
    norms = np.linalg.norm(out, axis=0)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
