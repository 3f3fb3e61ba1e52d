"""Benchmark: streaming online time warping (the BASELINE.json headline).

Measures, on the real audio shipped with the reference corpus (the Chopin
20-bar pair — the only wavs present in the mount):

1. **streaming_otw_rtf** (the ONE reported JSON line): real-time factor of
   the full Dixon-2005 online recurrence — every row/column band update,
   direction decision and path commit of the reference algorithm — executed
   on-device as the jitted set_live scan.  This is the engine's sustainable
   streaming throughput (audio-seconds aligned per wall-second).
2. diagnostics (stderr): per-insert dispatch latency of the one-frame
   streaming path and the amortized per-frame latency of block streaming.
   On this container's tunneled TPU each dispatch pays a ~30-50 ms relay
   round-trip (see .claude/skills/verify/SKILL.md); the on-device per-frame
   cost is the scan rate above.

``vs_baseline`` compares against the reference implementation's measured
throughput: the same recurrence run by a faithful numpy/python transcription
(tests/oracle.py) on this host — the reference repo publishes no numbers
(BASELINE.md), so its own code IS the baseline.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REF_WAV = "/root/reference/Songs/chopin/chopin_rubinstein_20b.wav"
LIVE_WAV = "/root/reference/Songs/chopin/chopin_rachmaninoff_20b.wav"
PARAMS = {"c": 50, "max_run_count": 3}  # livenote_live.py:94
HOP_SEC = 2048 / 22050.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import real_time_audio_sync_tpu as rtas
    from real_time_audio_sync_tpu.models import OnlineTimeWarping

    import jax

    log(f"devices: {jax.devices()}")

    ref = np.asarray(rtas.wav_to_chroma(REF_WAV))
    live = np.asarray(rtas.wav_to_chroma(LIVE_WAV))
    n_frames = live.shape[1]
    audio_sec = n_frames * HOP_SEC
    log(f"pair: ref {ref.shape[1]} frames, live {n_frames} frames ({audio_sec:.1f} s of audio)")

    # --- 1. on-device streaming recurrence throughput (set_live scan)
    def run_scan():
        eng = OnlineTimeWarping(ref, PARAMS)
        t0 = time.perf_counter()
        eng.set_live(live)
        return time.perf_counter() - t0, eng

    warm_t, _ = run_scan()  # includes compile on a cold cache
    times = []
    for _ in range(3):
        t, eng = run_scan()
        times.append(t)
    scan_wall = min(times)
    rtf = audio_sec / scan_wall
    log(f"set_live scan: warm {scan_wall*1e3:.1f} ms (first {warm_t:.1f} s) -> RTF {rtf:.0f}x, "
        f"{scan_wall/n_frames*1e6:.0f} us/frame on-device")

    # --- 2. per-insert dispatch latency (streaming mode, includes relay RTT)
    eng = OnlineTimeWarping(ref, PARAMS)
    eng.insert(live[:, 0])
    lat = []
    for i in range(1, min(41, n_frames)):
        t0 = time.perf_counter()
        eng.insert(live[:, i])
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1e3
    log(f"per-insert streaming: p50 {np.percentile(lat_ms, 50):.2f} ms, "
        f"p99 {np.percentile(lat_ms, 99):.2f} ms over {len(lat)} inserts")

    # --- 3. block streaming (one dispatch per 32 frames)
    eng = OnlineTimeWarping(ref, PARAMS)
    eng.insert_block(live[:, :32])  # compile
    eng2 = OnlineTimeWarping(ref, PARAMS)
    t0 = time.perf_counter()
    nb = 0
    for s in range(0, n_frames, 32):
        if eng2.insert_block(live[:, s : s + 32]) == "stop":
            break
        nb += 1
    block_wall = time.perf_counter() - t0
    done_frames = min(n_frames, (nb + 1) * 32)
    log(f"block streaming (32 frames/dispatch): {block_wall/done_frames*1e3:.2f} ms/frame amortized, "
        f"RTF {done_frames*HOP_SEC/block_wall:.0f}x")

    # --- 3b. batched corpus alignment (BASELINE.json config 5): vmapped
    # online-DTW over B pair-copies on the one chip
    from real_time_audio_sync_tpu.parallel import batched_set_live, pad_pairs

    B = 16
    r_b, l_b, rl_b, ll_b = pad_pairs([ref] * B, [live] * B)
    batched_set_live(r_b, l_b, rl_b, ll_b, PARAMS)  # compile
    t0 = time.perf_counter()
    paths, _ = batched_set_live(r_b, l_b, rl_b, ll_b, PARAMS)
    batch_wall = time.perf_counter() - t0
    log(f"batched corpus (B={B}, one chip): {batch_wall*1e3:.1f} ms total -> "
        f"aggregate RTF {B*audio_sec/batch_wall:.0f}x ({batch_wall/B/n_frames*1e6:.0f} us/frame/stream)")

    # --- 4. reference-implementation baseline on this host (numpy oracle)
    vs_baseline = None
    try:
        sys.path.insert(0, ".")
        from tests.oracle import OracleOTW

        oracle = OracleOTW(ref.astype(np.float64), PARAMS["c"], PARAMS["max_run_count"], "otw")
        live64 = live.astype(np.float64)
        t0 = time.perf_counter()
        for i in range(n_frames):
            if oracle.insert(live64[:, i]) == "stop":
                break
        py_wall = time.perf_counter() - t0
        py_rtf = audio_sec / py_wall
        vs_baseline = rtf / py_rtf
        log(f"reference-equivalent python: {py_wall:.2f} s -> RTF {py_rtf:.0f}x; ours/reference = {vs_baseline:.1f}x")
    except Exception as e:  # oracle unavailable — baseline is 1x real time
        log(f"python baseline unavailable ({e}); vs_baseline = RTF vs 1x real-time")
        vs_baseline = rtf

    # --- 4b. production scale: a ~3-minute piece (5x-tiled pair)
    try:
        ref5 = np.tile(ref, (1, 5))
        live5 = np.tile(live, (1, 5))
        eng = OnlineTimeWarping(ref5, PARAMS)
        eng.set_live(live5)  # compile
        t0 = time.perf_counter()
        eng2 = OnlineTimeWarping(ref5, PARAMS)
        eng2.set_live(live5)
        wall5 = time.perf_counter() - t0
        audio5 = live5.shape[1] * HOP_SEC
        log(f"3-minute scale (N={ref5.shape[1]}): {wall5*1e3:.0f} ms -> RTF {audio5/wall5:.0f}x "
            f"({wall5/live5.shape[1]*1e6:.0f} us/frame)")
    except Exception as e:
        log(f"3-minute diagnostic skipped ({e})")

    # --- 5. wide-band robustness config: per-step cost is O(c) in Python
    # but flat on the vector unit
    try:
        wide = {"c": 200, "max_run_count": 3}
        eng = OnlineTimeWarping(ref, wide)
        eng.set_live(live)
        t0 = time.perf_counter()
        eng2 = OnlineTimeWarping(ref, wide)
        eng2.set_live(live)
        wide_wall = time.perf_counter() - t0
        from tests.oracle import OracleOTW as _O

        oracle = _O(ref.astype(np.float64), 200, 3, "otw")
        t0 = time.perf_counter()
        for i in range(n_frames):
            if oracle.insert(live.astype(np.float64)[:, i]) == "stop":
                break
        wide_py = time.perf_counter() - t0
        log(f"wide band c=200: ours {wide_wall*1e3:.0f} ms vs python {wide_py*1e3:.0f} ms "
            f"-> {wide_py/wide_wall:.1f}x faster (RTF {audio_sec/wide_wall:.0f}x)")
    except Exception as e:
        log(f"wide-band diagnostic skipped ({e})")

    print(json.dumps({
        "metric": "streaming_otw_rtf",
        "value": round(rtf, 1),
        "unit": "audio_sec/wall_sec",
        "vs_baseline": round(vs_baseline, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
