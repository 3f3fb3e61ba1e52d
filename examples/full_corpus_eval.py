"""Full-scale corpus evaluation — the reference's ``test_all`` experience
(tests.py:199-262) at real corpus scale.

The reference's headline regime sweeps 8 pieces × 2–3 recordings
(multi-minute works, 11,464 beat annotations); its audio is absent from the
mount, so this harness materializes the synthetic full-scale corpus
(eval/synthetic.FULL_PIECES — same shape: 8 pieces, 20 recordings, ~11.3k
exact beats, ~100 minutes of audio) and runs the actual ``CorpusRunner``
over every i<j pair with every engine, in both the streaming-insert and the
fused single-launch modes, wall-clock included.  The resulting mean
"% of path points >3 s off" table is published in docs/ACCURACY.md.

Usage::

    python examples/full_corpus_eval.py [--root DIR] [--engines otw wtw ...]
        [--modes insert fused] [--pieces N1 N2 ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_ROOT = "/tmp/rtas_full_corpus"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default=DEFAULT_ROOT)
    ap.add_argument("--engines", nargs="+",
                    default=["dtw", "otw", "livenote", "livenote_v2",
                             "livenote_v2_diff", "wtw"])
    ap.add_argument("--modes", nargs="+", default=["insert", "fused"])
    ap.add_argument("--pieces", nargs="+", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke, not a measurement)")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from real_time_audio_sync_tpu.eval.corpus import CorpusRunner
    from real_time_audio_sync_tpu.eval.synthetic import build_full_corpus

    t0 = time.perf_counter()
    names = build_full_corpus(args.root, pieces=args.pieces, verbose=True)
    n_beats = 0
    n_rec = 0
    minutes = 0.0
    for name in names:
        d = os.path.join(args.root, name)
        for f in sorted(os.listdir(d)):
            if f.endswith(".csv"):
                n_rec += 1
                rows = sum(1 for _ in open(os.path.join(d, f)))
                n_beats += rows
            elif f.endswith(".wav"):
                minutes += os.path.getsize(os.path.join(d, f)) / (2 * 22050) / 60
    print(f"corpus: {len(names)} pieces, {n_rec} recordings, {n_beats} beat "
          f"annotations, {minutes:.0f} min of audio "
          f"(built/verified in {time.perf_counter()-t0:.0f} s)", flush=True)

    rows = []
    for engine in args.engines:
        for mode in args.modes:
            if engine == "dtw" and mode == "fused":
                continue  # offline DTW has one (wavefront) mode
            t0 = time.perf_counter()
            runner = CorpusRunner(args.root, engine=engine, mode=mode)
            report = runner.evaluate(verbose=False)
            wall = time.perf_counter() - t0
            per = [f"{r.score.pct_off_secs[3]:.2f}" for r in report.results]
            rows.append((engine, mode, report.mean_error, wall,
                         len(report.results)))
            print(f"{engine:>18s} {mode:>7s}: mean >3s off "
                  f"{report.mean_error:6.2f}%  ({len(report.results)} pairs, "
                  f"wall {wall:6.1f} s)  per-pair [{', '.join(per)}]",
                  flush=True)

    print("\n| engine | mode | mean % >3 s off | pairs | wall (s) |")
    print("|---|---|---|---|---|")
    for engine, mode, err, wall, n in rows:
        print(f"| {engine} | {mode} | {err:.2f} | {n} | {wall:.1f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
