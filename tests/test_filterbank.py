import numpy as np

from real_time_audio_sync_tpu.features.filterbank import chroma_filterbank


def test_shape_and_range():
    fb = chroma_filterbank(22050, 4096)
    assert fb.shape == (12, 2049)
    assert np.all(fb >= 0)
    assert np.all(np.isfinite(fb))
    # octave envelope keeps per-bin column norms <= 1
    assert np.sqrt((fb ** 2).sum(axis=0)).max() <= 1.0 + 1e-12


def test_dc_bin_negligible():
    fb = chroma_filterbank(22050, 4096)
    # DC sits ~3.85 octaves below the envelope centre → weight ~2e-5
    assert fb[:, 0].max() < 1e-4


def _pure_tone_chroma(freq_hz: float) -> int:
    """Chroma argmax of a windowed pure tone through the filterbank."""
    fs, n = 22050, 4096
    t = np.arange(n) / fs
    x = np.sin(2 * np.pi * freq_hz * t) * np.hanning(n)
    spec = np.abs(np.fft.rfft(x)) ** 2
    fb = chroma_filterbank(fs, n)
    return int(np.argmax(fb @ spec))


def test_pitch_classes_with_base_c():
    # base_c=True ⇒ row 0 = C.  A4=440 → row 9, E4≈329.63 → row 4, C5≈523.25 → row 0.
    assert _pure_tone_chroma(440.0) == 9
    assert _pure_tone_chroma(329.63) == 4
    assert _pure_tone_chroma(523.25) == 0


def test_octave_equivalence():
    # Same pitch class across octaves maps to the same chroma row.
    assert _pure_tone_chroma(220.0) == _pure_tone_chroma(880.0) == 9
