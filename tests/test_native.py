"""Native C++ runtime: ring buffer, wav decoder, threaded source."""

import threading

import numpy as np
import pytest

from real_time_audio_sync_tpu.native import NativeRingBuffer, native_available, native_decode_wav
from real_time_audio_sync_tpu.streaming.sources import SimulatedMic, ThreadedSource


def test_native_library_builds():
    assert native_available(), "g++ build of native/rtas_runtime.cpp failed"


def test_ring_buffer_basics():
    ring = NativeRingBuffer(1024)
    assert ring.native
    assert ring.capacity == 1024
    data = np.arange(100, dtype=np.float32)
    assert ring.push(data) == 100
    assert ring.readable() == 100
    out = ring.pop(60)
    np.testing.assert_array_equal(out, data[:60])
    out = ring.pop(100)  # short read
    np.testing.assert_array_equal(out, data[60:])
    assert ring.readable() == 0


def test_ring_buffer_wraps_and_rejects_overflow():
    ring = NativeRingBuffer(64)
    for round_ in range(10):  # force wraparound
        data = np.random.default_rng(round_).standard_normal(40).astype(np.float32)
        assert ring.push(data) == 40
        np.testing.assert_array_equal(ring.pop(40), data)
    big = np.zeros(200, np.float32)
    assert ring.push(big) == 64  # accepts only what fits


def test_ring_buffer_threaded_integrity():
    """SPSC stress: one producer, one consumer, bit-exact stream."""
    ring = NativeRingBuffer(4096)
    n = 200_000
    src = np.random.default_rng(0).standard_normal(n).astype(np.float32)
    received = []

    def produce():
        off = 0
        while off < n:
            off += ring.push(src[off : off + 1000])

    t = threading.Thread(target=produce)
    t.start()
    got = 0
    while got < n:
        chunk = ring.pop(777)
        got += chunk.size
        if chunk.size:
            received.append(chunk)
    t.join()
    np.testing.assert_array_equal(np.concatenate(received), src)


def test_native_wav_decode_matches_python(chopin_pair):
    ref_wav, _ = chopin_pair
    decoded = native_decode_wav(ref_wav)
    assert decoded is not None
    samples, sr = decoded
    assert sr == 22050

    # python reference decode
    import wave

    with wave.open(ref_wav, "rb") as w:
        raw = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        expect = (raw.astype(np.float32) / 32768.0).reshape(-1, 2).mean(axis=1)
    assert samples.shape == expect.shape
    np.testing.assert_allclose(samples, expect, atol=1e-7)


def test_threaded_source_preserves_stream(chopin_pair):
    _, live_wav = chopin_pair
    from real_time_audio_sync_tpu.utils.wavio import load_wav

    samples, _ = load_wav(live_wav)
    got = np.concatenate(list(ThreadedSource(SimulatedMic(live_wav, buffer_size=600))))
    np.testing.assert_array_equal(got, samples)


def test_native_decoder_rejects_non_wav(tmp_path):
    bad = tmp_path / "not_a_wav.wav"
    bad.write_bytes(b"definitely not RIFF data")
    assert native_decode_wav(str(bad)) is None
