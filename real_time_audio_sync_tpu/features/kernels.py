"""Fused Pallas chroma frontend kernel.

The chroma pipeline's FLOPs are two (T, 4096)×(4096, 2049) DFT matmuls plus
the (T, 2049)×(2049, 12) filterbank projection (features/chroma.py).  The
plain XLA path materializes the (T, 2049) power spectrogram in HBM between
them (~16 MB each way for a 3-minute piece).  This kernel tiles the
frequency axis and fuses window⊙DFT → |·|² → filterbank-accumulate in VMEM,
so the spectrogram never leaves the chip:

    for each (frame-tile i, freq-tile k):
        re = frames_i @ wcos[:, k]     (MXU)
        im = frames_i @ wsin[:, k]     (MXU)
        out_i += (re² + im²) @ fbᵀ[k]  (VPU + MXU)

The Hann window is folded into the DFT factor matrices, the frequency axis
is zero-padded to a lane multiple (extra bins have zero filterbank weight),
and L2 normalization stays outside (a 12×T epilogue).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from real_time_audio_sync_tpu.config import FFT_LEN, FS
from real_time_audio_sync_tpu.features.chroma import hann_window
from real_time_audio_sync_tpu.features.filterbank import chroma_filterbank

_LANES = 128
_CONSTS = {}


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def fused_constants(n_fft: int = FFT_LEN, fs: int = FS, dtype=np.float32, k_align: int = _LANES):
    """Windowed DFT factors and padded filterbank, cached on device.

    Shapes: wcos/wsin (n_fft, Kpad), fb_t (Kpad, 128) — the chroma axis is
    padded from 12 to one lane tile; callers slice [:12].  ``k_align`` must
    equal the kernel's frequency tile so the grid covers every bin.
    """
    key = (n_fft, fs, np.dtype(dtype).name, k_align)
    if key not in _CONSTS:
        k_bins = n_fft // 2 + 1
        k_pad = _round_up(k_bins, k_align)
        n = np.arange(n_fft, dtype=np.float64)[:, None]
        k = np.arange(k_pad, dtype=np.float64)[None, :]
        ang = 2.0 * np.pi * n * k / n_fft
        win = hann_window(n_fft)[:, None]
        wcos = (np.cos(ang) * win).astype(dtype)
        wsin = (np.sin(ang) * win).astype(dtype)
        # zero out padding bins so they contribute nothing
        wcos[:, k_bins:] = 0.0
        wsin[:, k_bins:] = 0.0
        fb = np.zeros((k_pad, _LANES), dtype)
        fb[:k_bins, :12] = chroma_filterbank(fs, n_fft).T.astype(dtype)
        _CONSTS[key] = (
            jax.device_put(wcos),
            jax.device_put(wsin),
            jax.device_put(fb),
        )
    return _CONSTS[key]


def _kernel(frames_ref, wcos_ref, wsin_ref, fb_ref, out_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    re = jnp.dot(frames_ref[:], wcos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames_ref[:], wsin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im
    out_ref[:] += jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("tile_t", "tile_k", "normalize"))
def _fused_chroma(frames, wcos, wsin, fb, tile_t: int, tile_k: int, normalize: bool):
    t_pad, n_fft = frames.shape
    k_pad = wcos.shape[1]
    grid = (t_pad // tile_t, k_pad // tile_k)
    raw = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_t, n_fft), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, tile_k), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, tile_k), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, _LANES), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_t, _LANES), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, _LANES), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * t_pad * n_fft * k_pad + 2 * t_pad * k_pad * _LANES,
            bytes_accessed=(t_pad * n_fft + 2 * n_fft * k_pad + k_pad * _LANES + t_pad * _LANES) * 4,
            transcendentals=0,
        ),
    )(frames, wcos, wsin, fb)
    raw = raw[:, :12]
    if normalize:
        norm = jnp.sqrt(jnp.sum(raw * raw, axis=1, keepdims=True))
        tiny = jnp.asarray(np.finfo(np.float32).tiny, raw.dtype)
        raw = raw / jnp.where(norm < tiny, jnp.ones_like(norm), norm)
    return raw.T  # (12, T_pad)


def chroma_frames_fused(frames, n_fft: int = FFT_LEN, fs: int = FS, normalize: bool = True, tile_t: int = 128, tile_k: int = 128):
    """(T, n_fft) float32 frames → (12, T) chroma via the fused kernel.

    Numerically equivalent to ``features.chroma.chroma_frames`` in float32
    (same matmul decomposition, different tiling of the reductions).
    """
    if tile_k % _LANES:
        raise ValueError(f"tile_k must be a multiple of {_LANES}")
    frames = jnp.asarray(frames, jnp.float32)
    t = frames.shape[0]
    t_pad = _round_up(max(t, 1), tile_t)
    if t_pad != t:
        frames = jnp.pad(frames, ((0, t_pad - t), (0, 0)))
    wcos, wsin, fb = fused_constants(n_fft, fs, np.float32, k_align=tile_k)
    out = _fused_chroma(frames, wcos, wsin, fb, tile_t, tile_k, normalize)
    return out[:, :t]
