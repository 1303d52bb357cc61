"""Summarize train_rehearsal JSONL curves and check preemption-overlap parity.

Usage:
    python scripts/rehearsal_report.py /tmp/rehearsal_cardiac_r5a.jsonl \
        [--resume /tmp/rehearsal_cardiac_r5b.jsonl] [--every 2]

Prints a markdown row pair (step / seg_loss / eval dice) for BENCHMARKS.md
and, with --resume, verifies every overlapping epoch row of the interrupted+
resumed run matches the uninterrupted one to all printed digits (the split
epoch's train-loss mean is exempt: it averages only post-resume steps — a
reporting artifact documented in BENCHMARKS.md round 4; its DICE, computed
from the state, must still match).
"""

from __future__ import annotations

import argparse
import json


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("curve")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--every", type=int, default=2,
                    help="print every Nth epoch row")
    args = ap.parse_args()

    rows = load(args.curve)
    if not rows:
        raise SystemExit(f"no epoch rows in {args.curve} — the rehearsal "
                         "died before its first epoch (check its log)")
    shown = rows[:: args.every]
    if rows and rows[-1] is not shown[-1]:
        shown.append(rows[-1])
    print("| step | " + " | ".join(str(r["step"]) for r in shown) + " |")
    print("|---" * (len(shown) + 1) + "|")
    print("| seg_loss | " + " | ".join(f"{r['seg_loss']:.4f}"
                                       for r in shown) + " |")
    print("| eval dice | " + " | ".join(f"{r['dice']:.4f}"
                                        for r in shown) + " |")
    mean_sps = sum(r["step_seconds"] for r in rows) / max(len(rows), 1)
    print(f"\n{len(rows)} epochs, final dice {rows[-1]['dice']:.6f}, "
          f"mean wall step_seconds {mean_sps:.3f} (host data-gen bound; "
          f"device step time is the profiler's number)")

    if args.resume:
        res = load(args.resume)
        by_step = {r["step"]: r for r in rows}
        n_exact, n_dice_only, mismatches = 0, 0, []
        for r in res:
            a = by_step.get(r["step"])
            if a is None:
                continue
            if (a["total_loss"] == r["total_loss"]
                    and a["seg_loss"] == r["seg_loss"]
                    and a["dice"] == r["dice"]):
                n_exact += 1
            elif a["dice"] == r["dice"]:
                n_dice_only += 1  # split-epoch train-loss mean artifact
            else:
                mismatches.append((r["step"], a, r))
        print(f"\noverlap vs {args.resume}: {n_exact} rows exact, "
              f"{n_dice_only} dice-exact (split-epoch loss-mean artifact), "
              f"{len(mismatches)} MISMATCHED")
        for step, a, r in mismatches:
            print(f"  step {step}: uninterrupted {a} vs resumed {r}")
        if mismatches:
            raise SystemExit(1)
        if n_dice_only > 1:
            # The documented artifact is exactly ONE split epoch (the one the
            # SIGTERM landed in). More than one dice-exact/loss-mismatched row
            # means resume corrupted the train-loss accumulation — fail.
            raise SystemExit(
                f"{n_dice_only} dice-only rows; the split-epoch artifact "
                "accounts for at most 1")


if __name__ == "__main__":
    main()
