import numpy as np
import pytest

from real_time_audio_sync_tpu.features import chroma as jchroma
from real_time_audio_sync_tpu.utils.wavio import load_wav

from tests.oracle import oracle_chroma, oracle_stft


@pytest.fixture(scope="module")
def random_wav():
    rng = np.random.default_rng(0)
    return rng.standard_normal(22050 * 3).astype(np.float64) * 0.1


def test_num_frames_matches_reference_semantics():
    # int(((N - L)/H) + 1) with N = len + L/2 (chroma.py:49-54)
    for n in [0, 1000, 2048, 4096, 4097, 100000, 771750]:
        padded = n + 2048
        expect = max(0, (padded - 4096) // 2048 + 1)
        assert jchroma.num_frames(n) == expect


def test_bucketed_compile_is_exact_and_shared(random_wav):
    """Length bucketing pads to a power of two and slices the result: output
    matches the unbucketed pipeline (to the ulp level — XLA tiles the DFT
    matmuls differently per shape), and nearby lengths share one compiled
    program (one compile per bucket, not per file)."""
    before = jchroma.compiled_bucket_count()
    lens = [22050 * 2 + 7, 22050 * 2 + 4096, 22050 * 2]
    for n in lens:
        wav = random_wav[:n]
        bucketed = jchroma.chroma_from_samples(wav, dtype=np.float64)
        direct = jchroma.chroma_from_samples(wav, dtype=np.float64, bucket=False)
        assert bucketed.shape == direct.shape
        np.testing.assert_allclose(bucketed, direct, rtol=1e-12, atol=1e-14)
    # all three lengths fall into the 65536-sample bucket → one new program
    assert jchroma.compiled_bucket_count() <= before + 1


def test_create_stft_and_create_chroma_match_oracle(random_wav):
    """The reference's intermediate API surface (chroma.py:44-75): complex
    STFT and spectrum→chroma, exposed for parity with create_stft /
    create_chroma."""
    from tests.oracle import oracle_chroma

    wav = random_wav[: 22050 * 2]
    ft = jchroma.create_stft(wav, dtype=np.float64)
    want = oracle_stft(wav)
    assert ft.shape == want.shape == (2049, jchroma.num_frames(len(wav)))
    np.testing.assert_allclose(ft, want, rtol=1e-9, atol=1e-9)
    chroma = jchroma.create_chroma(ft, dtype=np.float64)
    np.testing.assert_allclose(chroma, oracle_chroma(wav), rtol=1e-8, atol=1e-10)
    raw = jchroma.create_chroma(ft, normalize=False, dtype=np.float64)
    assert np.all(np.linalg.norm(raw, axis=0) != 1.0)  # unnormalized variant


def test_chroma_matches_oracle_f64(random_wav):
    ours = jchroma.chroma_from_samples(random_wav, dtype=np.float64)
    ref = oracle_chroma(random_wav)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-10)


def test_chroma_f32_close_to_f64(random_wav):
    f32 = jchroma.chroma_from_samples(random_wav, dtype=np.float32)
    f64 = oracle_chroma(random_wav)
    # normalized chroma: f32 matmul-DFT error stays small
    np.testing.assert_allclose(f32, f64, atol=5e-4)


def test_silence_gives_zero_columns_not_nan():
    out = jchroma.chroma_from_samples(np.zeros(22050), dtype=np.float64)
    assert out.shape[1] == jchroma.num_frames(22050)
    assert np.all(out == 0.0)


def test_col_matches_single_frame(random_wav):
    buf = random_wav[:4096]
    col = jchroma.wav_to_chroma_col(buf, dtype=np.float64)
    spec = np.abs(np.fft.rfft(buf * np.hanning(4096))) ** 2
    from real_time_audio_sync_tpu.features.filterbank import chroma_filterbank

    raw = chroma_filterbank(22050, 4096) @ spec
    ref = raw / np.linalg.norm(raw)
    np.testing.assert_allclose(col, ref, rtol=1e-8, atol=1e-10)


def test_diff_is_rectified(random_wav):
    chroma = jchroma.chroma_from_samples(random_wav, dtype=np.float64)
    diff = np.clip(np.diff(chroma, axis=1), 0, np.inf)
    got = jchroma.chroma_diff_from_samples(random_wav, dtype=np.float64)
    np.testing.assert_allclose(got, diff, rtol=1e-8, atol=1e-12)
    assert np.all(got >= 0)


def test_real_audio_chroma(chopin_pair):
    ref_path, _ = chopin_pair
    wav, fs = load_wav(ref_path)
    assert fs == 22050
    out = jchroma.chroma_from_samples(wav, dtype=np.float64)
    assert out.shape[0] == 12
    assert out.shape[1] == jchroma.num_frames(len(wav))
    ref = oracle_chroma(wav)
    np.testing.assert_allclose(out, ref, rtol=1e-7, atol=1e-9)
    # columns are unit-normalized (or zero)
    norms = np.linalg.norm(out, axis=0)
    assert np.all((np.abs(norms - 1) < 1e-9) | (norms == 0))


def test_frame_span_gather_matches_reshape_and_numpy():
    """frame_span's two implementations (reshape+concat for n_fft=2·hop,
    gather otherwise) agree with each other and with numpy striding."""
    import jax.numpy as jnp

    from real_time_audio_sync_tpu.features.chroma import frame_span

    rng = np.random.default_rng(5)
    hop, n_fft, t = 64, 128, 7
    x = rng.random((t - 1) * hop + n_fft)
    want = np.stack([x[i * hop : i * hop + n_fft] for i in range(t)])
    got_reshape = np.asarray(frame_span(jnp.asarray(x), t, n_fft, hop))
    np.testing.assert_array_equal(got_reshape, want)
    # force the gather branch with a non-half hop
    hop2, t2 = 48, 5
    x2 = rng.random((t2 - 1) * hop2 + n_fft)
    want2 = np.stack([x2[i * hop2 : i * hop2 + n_fft] for i in range(t2)])
    got_gather = np.asarray(frame_span(jnp.asarray(x2), t2, n_fft, hop2))
    np.testing.assert_array_equal(got_gather, want2)


def test_host_chroma_scipy_matches_numpy_reference():
    """host_chroma_frames routes f32 through scipy's native-f32 pocketfft
    (the multi-stream chroma-transfer hot path); its columns must stay
    within float32 rounding of the previous np.fft.rfft pipeline, and the
    f64 parity dtype must still go through np.fft exactly."""
    from real_time_audio_sync_tpu.features.chroma import (
        host_chroma_frames,
        host_frontend_constants,
    )

    rng = np.random.default_rng(11)
    frames = rng.standard_normal((24, 4096)).astype(np.float32)

    def np_reference(fr):
        dtype = fr.dtype
        win, fb_t = host_frontend_constants(4096, 22050, dtype)
        wf = fr * win[None, :]
        spec = np.fft.rfft(wf, axis=1)
        power = spec.real.astype(dtype) ** 2 + spec.imag.astype(dtype) ** 2
        raw = power @ fb_t
        norm = np.sqrt(np.sum(raw * raw, axis=1, keepdims=True))
        tiny = np.finfo(dtype).tiny
        return np.ascontiguousarray(
            (raw / np.where(norm < tiny, np.ones_like(norm), norm)).T)

    got32 = host_chroma_frames(frames)
    assert got32.dtype == np.float32
    np.testing.assert_allclose(got32, np_reference(frames), atol=2e-6)

    frames64 = frames.astype(np.float64)
    np.testing.assert_array_equal(host_chroma_frames(frames64),
                                  np_reference(frames64))


def test_host_chroma_chunking_invariant():
    """The cache-blocked f32 path (window→rfft→square→project per ~1 MB
    chunk) must be bit-identical to the previous monolithic pass whenever
    T fits one chunk (identical shapes ⇒ identical arithmetic), within f32
    rounding beyond that (BLAS picks different sgemm/gemv kernels per batch
    shape — the docs/PARITY.md deviation-8 class, which host extraction
    always had across dispatch sizes), and must never touch the caller's
    frames even with overwrite_frames=True."""
    from real_time_audio_sync_tpu.features.chroma import (
        host_chroma_frames,
        host_frontend_constants,
        _host_fb_interleaved,
    )
    from scipy import fft as sfft

    def old_monolithic(fr):
        win, _ = host_frontend_constants(4096, 22050, np.float32)
        v = sfft.rfft(fr * win, axis=1).view(np.float32)
        raw = (v * v) @ _host_fb_interleaved(4096, 22050)
        norm = np.sqrt(np.sum(raw * raw, axis=1, keepdims=True))
        tiny = np.finfo(np.float32).tiny
        return np.ascontiguousarray(
            (raw / np.where(norm < tiny, np.ones_like(norm), norm)).T)

    rng = np.random.default_rng(7)
    chunk = (1 << 20) // (4 * 4096)  # the implementation's chunk rows (64)
    big = rng.standard_normal((2 * chunk + 3, 4096)).astype(np.float32)
    for t in (1, chunk - 1, chunk, chunk + 1, 2 * chunk + 3):
        sub = np.array(big[:t], copy=True)
        got = host_chroma_frames(sub, overwrite_frames=True)
        if t <= chunk:
            np.testing.assert_array_equal(got, old_monolithic(big[:t]))
        else:
            np.testing.assert_allclose(got, old_monolithic(big[:t]), atol=2e-6)
        np.testing.assert_array_equal(sub, big[:t])  # caller buffer intact


def test_host_chroma_workers_bit_identical():
    """Thread-pooled extraction must be bit-identical to single-threaded
    for ANY worker count: the pool distributes the SAME cache-block chunks
    the serial sweep uses, so per-row arithmetic is unchanged (the
    multi-core serving path, round-3 verdict item 5).  Also gated by the
    RTAS_HOST_FFT_WORKERS env flag."""
    import os

    from real_time_audio_sync_tpu.features.chroma import host_chroma_frames

    rng = np.random.default_rng(11)
    frames = rng.standard_normal((200, 4096)).astype(np.float32)
    base = host_chroma_frames(frames)
    for w in (2, 3, 8):
        np.testing.assert_array_equal(
            base, host_chroma_frames(frames, workers=w))
    for t in (0, 1, 5):  # fewer chunks than workers
        np.testing.assert_array_equal(
            host_chroma_frames(frames[:t]),
            host_chroma_frames(frames[:t], workers=4))
    os.environ["RTAS_HOST_FFT_WORKERS"] = "3"
    try:
        np.testing.assert_array_equal(base, host_chroma_frames(frames))
    finally:
        del os.environ["RTAS_HOST_FFT_WORKERS"]
