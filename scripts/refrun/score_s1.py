"""Score the stage-1 half of the head-to-head (ROADMAP item 7a).

Both sides' stage-1 static renders (s1_view{v:02d}.npy, uint8 HxWx3 —
written by dump_ref_s1.py / dump_ours_s1.py) are compared against the
stage-1 training targets (gt_view{v:02d}.npy, written by
dump_ours_s1.py — the vid2img-collapsed images both trainers fit) with
the SAME metric code the stage-2 h2h uses (eval/metrics.py).

    python scripts/refrun/score_s1.py --gt /tmp/refrun/pred_ours_s1 \
        --ref /tmp/refrun/pred_ref_s1 --ours /tmp/refrun/pred_ours_s1
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from videoloop3d_tpu.eval import metrics as M  # noqa: E402


def _score(a, b, metric):
    return M.compute_img_metric(a[None], b[None], metric)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt", required=True)
    ap.add_argument("--ref", required=True)
    ap.add_argument("--ours", required=True)
    opts = ap.parse_args()

    views = sorted(int(re.search(r"(\d+)", os.path.basename(p)).group(1))
                   for p in glob.glob(os.path.join(opts.gt, "gt_view*.npy")))
    rows = []
    for v in views:
        gt = np.load(os.path.join(
            opts.gt, f"gt_view{v:02d}.npy")).astype(np.float32) / 255.0
        rv = np.load(os.path.join(
            opts.ref, f"s1_view{v:02d}.npy")).astype(np.float32) / 255.0
        ov = np.load(os.path.join(
            opts.ours, f"s1_view{v:02d}.npy")).astype(np.float32) / 255.0
        rows.append((v, _score(rv, gt, "psnr"), _score(ov, gt, "psnr"),
                     _score(rv, gt, "ssim"), _score(ov, gt, "ssim")))

    print("| view | ref PSNR | ours PSNR | ref SSIM | ours SSIM |")
    print("|---|---|---|---|---|")
    for v, pr, po, sr, so in rows:
        print(f"| {v} | {pr:.2f} | {po:.2f} | {sr:.4f} | {so:.4f} |")
    arr = np.array([r[1:] for r in rows])
    m = arr.mean(axis=0)
    print(f"| **mean** | **{m[0]:.2f}** | **{m[1]:.2f}** | "
          f"**{m[2]:.4f}** | **{m[3]:.4f}** |")


if __name__ == "__main__":
    main()
