"""Aggregate h2h eval_metrics.txt files into the comparison table.

    python scripts/refrun/h2h_table.py ref=/tmp/refrun/pred_ref \
        ours_s2=/tmp/refrun/pred_ours_seed2 ours_s3=... [--holdout 4]

Prints per-run means over TRAINED views (holdout excluded), the holdout
view's PSNR separately, and — when multiple ours_* runs are given —
their mean +/- band per metric.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

COLS = ["nnf", "nnb", "dyn", "lpips", "lpips_sw", "loop", "psnr", "ssim",
        "psnr_full", "ssim_full"]   # *_full absent in pre-r5 CSVs -> nan


def load(path):
    rows = {}
    with open(os.path.join(path, "eval_metrics.txt")) as f:
        header = [c.strip() for c in f.readline().split(",")]
        for line in f:
            parts = [p.strip() for p in line.split(",")]
            if len(parts) < len(header) or parts[0] == "mean":
                continue
            name = parts[0]
            if "view" not in name:
                continue
            v = int("".join(ch for ch in name.split("view")[-1]
                            if ch.isdigit()))
            rows[v] = {header[i]: float(parts[i])
                       for i in range(1, len(header))}
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", help="name=dir pairs")
    ap.add_argument("--holdout", type=int, default=4)
    opts = ap.parse_args()

    table = {}
    for spec in opts.runs:
        name, path = spec.split("=", 1)
        rows = load(path)
        trained = [v for v in sorted(rows) if v != opts.holdout]
        means = {c: float(np.mean([rows[v].get(c, float("nan"))
                                   for v in trained]))
                 for c in COLS}
        means["holdout_psnr"] = rows.get(opts.holdout, {}).get(
            "psnr", float("nan"))
        means["holdout_psnr_full"] = rows.get(opts.holdout, {}).get(
            "psnr_full", float("nan"))
        table[name] = means

    cols = COLS + ["holdout_psnr", "holdout_psnr_full"]
    print("| run | " + " | ".join(cols) + " |")
    print("|" + "---|" * (len(cols) + 1))
    for name, m in table.items():
        print(f"| {name} | " + " | ".join(
            f"{m[c]:.3f}" if np.isfinite(m[c]) else "nan"
            for c in cols) + " |")

    ours = [m for n, m in table.items() if n.startswith("ours")]
    if len(ours) > 1:
        print(f"\nours band over {len(ours)} seeds "
              f"(mean +/- max-dev, trained views):")
        for c in cols:
            vals = np.array([m[c] for m in ours])
            if np.isfinite(vals).all():
                mu = vals.mean()
                print(f"  {c}: {mu:.3f} +/- {np.abs(vals - mu).max():.3f}"
                      f"  [{vals.min():.3f}, {vals.max():.3f}]")


if __name__ == "__main__":
    main()
