import pathlib

import numpy as np

_GOLDEN = pathlib.Path(__file__).parent / "golden"

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


def test_matches_librosa_golden_bit_for_bit():
    """The in-repo derivation equals the checked-in golden constant generated
    by the line-faithful librosa 0.6.3 transcription
    (tests/golden/make_golden_filterbank.py) — SURVEY.md §7 hard part 3.
    librosa itself is not installable here; 0.6.3 is the Python-2-era
    version the reference ran (chroma.py:69)."""
    golden = np.load(_GOLDEN / "chromafb_22050_4096.npy")
    ours = np.asarray(chroma_filterbank(22050, 4096))
    np.testing.assert_array_equal(ours, golden)


def test_golden_regenerates_identically():
    """The generation script is deterministic and still matches the artifact
    (guards against silent edits to either)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "make_golden", _GOLDEN / "make_golden_filterbank.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fb = mod.librosa_0_6_3_chroma(22050, 4096)
    np.testing.assert_array_equal(fb, np.load(_GOLDEN / "chromafb_22050_4096.npy"))


def test_frontend_matches_frozen_chroma_columns():
    """The full JAX frontend reproduces frozen reference-pipeline chroma
    columns (a C-major chord + noise, seed in the artifact)."""
    from real_time_audio_sync_tpu.features.chroma import chroma_from_samples

    data = np.load(_GOLDEN / "chroma_columns_cmaj.npz")
    rng = np.random.default_rng(int(data["wav_seed"]))
    t = np.arange(22050 * 2) / 22050.0
    wav = (0.4 * np.sin(2 * np.pi * 261.63 * t)
           + 0.3 * np.sin(2 * np.pi * 329.63 * t)
           + 0.2 * np.sin(2 * np.pi * 392.0 * t)
           + 0.05 * rng.standard_normal(t.shape))
    ours = chroma_from_samples(wav, dtype=np.float64)[:, :8]
    np.testing.assert_allclose(ours, data["chroma"], rtol=1e-8, atol=1e-10)
