"""Generate the golden chroma filterbank constant.

librosa is not installable in this build environment (zero egress), so the
golden is produced by a LINE-FAITHFUL transcription of
``librosa.filters.chroma`` from librosa 0.6.3 — the last release supporting
Python 2 and therefore the version contemporaneous with the reference
(chroma.py:69 calls ``librosa.filters.chroma(fs, fft_len)`` with defaults,
which in 0.6.x returns float64).  Every line below mirrors the published
0.6.3 source (librosa/filters.py ``chroma``, librosa/core/convert ``hz_to_octs``,
librosa/util/utils ``normalize`` with its default threshold/fill semantics);
this is an independent check against the re-derivation in
real_time_audio_sync_tpu/features/filterbank.py, which was written from the
Dan Ellis chromafb formulation rather than from librosa's code.

Run:  python tests/golden/make_golden_filterbank.py
Writes ``chromafb_22050_4096.npy`` next to this file.
"""

import os

import numpy as np


def hz_to_octs(frequencies, A440=440.0):
    # librosa 0.6.3 core.convert.hz_to_octs
    return np.log2(np.asanyarray(frequencies) / (float(A440) / 16))


def util_normalize_l2_cols(S):
    # librosa 0.6.3 util.normalize(S, norm=2, axis=0): default
    # threshold=tiny(mag), fill=None -> under-threshold columns left as-is
    mag = np.abs(S).astype(np.float64)
    threshold = np.finfo(mag.dtype).tiny
    length = np.sum(mag ** 2, axis=0, keepdims=True) ** (1.0 / 2)
    small_idx = length < threshold
    length[small_idx] = 1.0
    return S / length


def librosa_0_6_3_chroma(sr, n_fft, n_chroma=12, A440=440.0, ctroct=5.0,
                         octwidth=2, norm=2, base_c=True):
    # librosa 0.6.3 filters.chroma, defaults as called by the reference
    assert norm == 2
    frequencies = np.linspace(0, sr, n_fft, endpoint=False)[1:]
    frqbins = n_chroma * hz_to_octs(frequencies, A440)
    frqbins = np.concatenate(([frqbins[0] - 1.5 * n_chroma], frqbins))
    binwidthbins = np.concatenate((np.maximum(frqbins[1:] - frqbins[:-1], 1.0), [1]))
    D = np.subtract.outer(frqbins, np.arange(0, n_chroma, dtype="d")).T
    n_chroma2 = np.round(float(n_chroma) / 2)
    D = np.remainder(D + n_chroma2 + 10 * n_chroma, n_chroma) - n_chroma2
    wts = np.exp(-0.5 * (2 * D / np.tile(binwidthbins, (n_chroma, 1))) ** 2)
    wts = util_normalize_l2_cols(wts)
    if octwidth is not None:
        wts *= np.tile(
            np.exp(-0.5 * (((frqbins / n_chroma - ctroct) / octwidth) ** 2)),
            (n_chroma, 1),
        )
    if base_c:
        wts = np.roll(wts, -3 * (n_chroma // 12), axis=0)
    return np.ascontiguousarray(wts[:, : int(1 + n_fft / 2)])


if __name__ == "__main__":
    fb = librosa_0_6_3_chroma(22050, 4096)
    out = os.path.join(os.path.dirname(__file__), "chromafb_22050_4096.npy")
    np.save(out, fb)
    print(f"wrote {out}: shape {fb.shape}, dtype {fb.dtype}, sum {fb.sum():.12f}")
