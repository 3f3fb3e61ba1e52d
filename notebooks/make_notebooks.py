"""Build and EXECUTE the two committed notebooks (SURVEY.md §2 C18; round-4
verdict #8) so `.ipynb` files with stored outputs render on GitHub:

- ``livenote_overlay.ipynb`` — LiveNote vs LiveNoteV2 accumulated-cost
  heatmaps with committed paths on the real Chopin pair (the reference's
  ``livenote_v2.ipynb`` cells 3-8 regime), plus a beat-accuracy comparison.
- ``field_replay.ipynb`` — a recorded 2018 field-test log parsed, its
  committed accuracy summary reproduced to 1e-9 by our scorer, and its path
  overlaid on the offline DTW path (the reference's ``field_testing.ipynb``
  cells 5-9 regime).

Both execute on the CPU backend (deterministic, no relay dependency) as
thin wrappers over the example code (`examples/heatmap_overlay.py`,
`examples/accuracy_report.py`); regenerate with::

    python notebooks/make_notebooks.py
"""

from __future__ import annotations

import pathlib
import sys

import nbformat
from nbclient import NotebookClient

HERE = pathlib.Path(__file__).resolve().parent
REPO = HERE.parent

SETUP = """\
import pathlib, sys
REPO = pathlib.Path.cwd()
if not (REPO / "real_time_audio_sync_tpu").exists():
    REPO = REPO.parent  # executed from notebooks/
sys.path.insert(0, str(REPO))

# the container's sitecustomize registers the TPU relay backend
# unconditionally; pin the CPU platform so the notebook is deterministic
# and runnable anywhere (tests/conftest.py does the same for the suite)
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import matplotlib.pyplot as plt

REF_WAV = "/root/reference/Songs/chopin/chopin_rubinstein_20b.wav"
LIVE_WAV = "/root/reference/Songs/chopin/chopin_rachmaninoff_20b.wav"
print("backend:", jax.devices()[0].platform)"""


def _nb(cells):
    nb = nbformat.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3"}
    nb.cells = cells
    return nb


def _md(src):
    return nbformat.v4.new_markdown_cell(src)


def _code(src):
    return nbformat.v4.new_code_cell(src)


def livenote_overlay():
    return _nb([
        _md(
            "# LiveNote vs LiveNoteV2 — cost heatmap + committed path\n"
            "\n"
            "Notebook equivalent of the reference's `livenote_v2.ipynb` "
            "(cells 3-8): run both online engines over the real Chopin "
            "20-bar pair, show each accumulated-cost band with the "
            "committed path overlaid, and compare beat accuracy.\n"
            "\n"
            "Thin wrapper over `examples/heatmap_overlay.py`; executes on "
            "CPU (no TPU required). The V2 monotone guard's measured value "
            "on adversarial cases is tabled in `docs/ACCURACY.md`."),
        _code(SETUP),
        _code(
            "import real_time_audio_sync_tpu as rtas\n"
            "\n"
            "ref_seq = rtas.wav_to_chroma(REF_WAV)\n"
            "live_seq = rtas.wav_to_chroma(LIVE_WAV)\n"
            "print(f\"ref {ref_seq.shape[1]} frames, live {live_seq.shape[1]} "
            "frames (12-dim chroma, 92.9 ms hop)\")"),
        _code(
            "from real_time_audio_sync_tpu.models import LiveNote, LiveNoteV2\n"
            "\n"
            "params = {\"search_band_width\": 50, \"max_run_count\": 3}  # livenote_live.py:94\n"
            "engines = {\"LiveNote\": LiveNote(ref_seq, params),\n"
            "           \"LiveNoteV2\": LiveNoteV2(ref_seq, params)}\n"
            "for eng in engines.values():\n"
            "    eng.set_live(live_seq)\n"
            "{name: len(eng.path) for name, eng in engines.items()}"),
        _code(
            "fig, axes = plt.subplots(1, 2, figsize=(14, 6))\n"
            "for ax, (name, engine) in zip(axes, engines.items()):\n"
            "    acc = np.asarray(engine.acc_cost, dtype=float).copy()\n"
            "    acc[~np.isfinite(acc)] = np.nan\n"
            "    acc[acc >= 1e9] = np.nan  # uncomputed band exterior\n"
            "    t_max = engine.live_ptr + 1\n"
            "    im = ax.imshow(acc[:t_max].T, origin=\"lower\", aspect=\"auto\",\n"
            "                   cmap=\"viridis\")  # sequential magnitude ramp\n"
            "    path = engine.path_array\n"
            "    ax.plot(path[:, 0], path[:, 1], \"r-\", linewidth=1.2,\n"
            "            label=\"committed path\")\n"
            "    ax.set_xlabel(\"live frame\")\n"
            "    ax.set_ylabel(\"ref frame\")\n"
            "    ax.set_title(f\"{name}: accumulated cost + committed path\")\n"
            "    ax.legend(loc=\"lower right\")\n"
            "    fig.colorbar(im, ax=ax, shrink=0.8, label=\"accumulated cost\")\n"
            "fig.tight_layout()\n"
            "plt.show()"),
        _code(
            "from real_time_audio_sync_tpu.eval import PathScorer\n"
            "\n"
            "scorer = PathScorer.for_pair(REF_WAV, LIVE_WAV)\n"
            "print(f\"{'engine':<12} {'>1 beat %':>10} {'>3 beats %':>11} {'>3 s %':>8}\")\n"
            "for name, eng in engines.items():\n"
            "    r = scorer.score(eng.path)\n"
            "    print(f\"{name:<12} {r.pct_off_beats[1]:>10.2f} \"\n"
            "          f\"{r.pct_off_beats[3]:>11.2f} {r.pct_off_3s:>8.2f}\")"),
        _md(
            "Both engines stay inside the recorded field-test regime on this "
            "pair (0-4% >1 beat — BASELINE.md). Engine selection guidance "
            "(when V2's monotone guard helps, when the diff feature hurts) "
            "is the \"which engine when\" matrix in the README, driven by "
            "the full corpus table in `docs/ACCURACY.md`."),
    ])


def field_replay():
    return _nb([
        _md(
            "# Field-test replay — recorded log vs the offline path\n"
            "\n"
            "Notebook equivalent of the reference's `field_testing.ipynb` "
            "(cells 5-9): parse one of the committed 2018 WTW field-test "
            "logs, reproduce its recorded accuracy summary with our scorer "
            "(to 1e-9 — the same check `tests/test_eval.py` pins for all "
            "three logs), and overlay the recorded live path on the offline "
            "DTW alignment of the same reference recording.\n"
            "\n"
            "Executes on CPU; thin wrapper over `eval/logs.py` + "
            "`eval/scorer.py` + the public `DTW()` surface."),
        _code(SETUP),
        _code(
            "from real_time_audio_sync_tpu.eval import parse_field_log\n"
            "\n"
            "LOG = \"/root/reference/tests/wtw_test_live_1523037133.83.txt\"\n"
            "log = parse_field_log(LOG)\n"
            "print(\"reference recording:\", log.reference_recording)\n"
            "print(\"params:\", log.params())\n"
            "print(f\"{len(log.path)} recorded path points\")\n"
            "print(\"committed accuracy summary:\")\n"
            "for line in log.summary:\n"
            "    print(\"   \", line)"),
        _code(
            "from real_time_audio_sync_tpu.eval import GroundTruth, PathScorer\n"
            "from real_time_audio_sync_tpu.eval.logs import parse_summary_percentages\n"
            "\n"
            "scorer = PathScorer(\n"
            "    GroundTruth.from_csv(REF_WAV[:-4] + \".csv\"),\n"
            "    GroundTruth.from_csv(LIVE_WAV[:-4] + \".csv\"),\n"
            ")\n"
            "result = scorer.score(log.path)\n"
            "recorded = parse_summary_percentages(log.summary)\n"
            "ours = [result.pct_off_beats[t] for t in (1, 3, 5, 10)]\n"
            "print(f\"{'threshold':>10} {'recorded %':>11} {'recomputed %':>13}\")\n"
            "for t, rec, got in zip((1, 3, 5, 10), recorded, ours):\n"
            "    print(f\"{'>'+str(t)+' beat':>10} {rec:>11.6f} {got:>13.6f}\")\n"
            "np.testing.assert_allclose(ours, recorded, atol=1e-9)\n"
            "print(\"scorer reproduces the 2018 summary to 1e-9\")"),
        _code(
            "import real_time_audio_sync_tpu as rtas\n"
            "from real_time_audio_sync_tpu.models import DTW\n"
            "\n"
            "ref_seq = rtas.wav_to_chroma(REF_WAV)\n"
            "live_seq = rtas.wav_to_chroma(LIVE_WAV)\n"
            "cost, acc, offline_path = DTW(live_seq, ref_seq)\n"
            "offline_path = np.asarray(offline_path)\n"
            "print(f\"offline DTW path: {len(offline_path)} points, \"\n"
            "      f\"cost matrix {cost.shape}\")"),
        _code(
            "field = np.asarray(log.path)\n"
            "fig, ax = plt.subplots(figsize=(9, 7))\n"
            "masked = acc.copy()\n"
            "masked[~np.isfinite(masked)] = np.nan\n"
            "im = ax.imshow(masked.T, origin=\"lower\", aspect=\"auto\",\n"
            "               cmap=\"viridis\")  # sequential magnitude ramp\n"
            "ax.plot(offline_path[:, 0], offline_path[:, 1], \"r-\",\n"
            "        linewidth=1.4, label=\"offline DTW path (this repo)\")\n"
            "ax.plot(field[:, 0], field[:, 1], \"w--\", linewidth=1.0,\n"
            "        label=\"recorded 2018 field path\")\n"
            "ax.set_xlabel(\"live frame\")\n"
            "ax.set_ylabel(\"ref frame\")\n"
            "ax.set_title(\"Recorded field-test path vs offline alignment\")\n"
            "ax.legend(loc=\"lower right\")\n"
            "fig.colorbar(im, ax=ax, shrink=0.8, label=\"accumulated cost\")\n"
            "fig.tight_layout()\n"
            "plt.show()"),
        _md(
            "The recorded path tracks a *different live take* (a 2018 "
            "hall performance against the same score), so it deviates from "
            "the offline alignment of the in-repo pair where the performer "
            "did — the overlay is the same qualitative readout the "
            "reference notebook produced. The repo's own field logs "
            "(written by `ScoreFollower.stop()`) are byte-compatible with "
            "this parser (tests/test_eval.py round-trip)."),
    ])


def main() -> int:
    for name, build in (("livenote_overlay", livenote_overlay),
                        ("field_replay", field_replay)):
        nb = build()
        client = NotebookClient(nb, timeout=600, kernel_name="python3",
                                resources={"metadata": {"path": str(HERE)}})
        client.execute()
        dest = HERE / f"{name}.ipynb"
        nbformat.write(nb, str(dest))
        n_out = sum(len(c.get("outputs", [])) for c in nb.cells)
        print(f"wrote {dest} ({n_out} stored outputs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
