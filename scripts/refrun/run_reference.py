"""Run the *actual reference implementation* on CPU for the head-to-head.

VERDICT r3 item 1: quality parity must be measured against the reference
itself, not self-consistency.  The reference runs on CPU
(`/root/reference/train_3dvid.py:70-73`: gpu_num <= 0 -> DataParallelCPU;
stage 1's nn.DataParallel with an empty device list also passes through),
and torch (CPU) is installed here.  The missing third-party packages are
interface-shimmed in ./shims (configargparse, unfoldNd, pytorch_msssim,
torchvision, and pytorch3d's `rasterize_meshes` backed by this repo's C++
rasterizer).  No reference code is copied or modified — the reference
tree is executed read-only via runpy with a scratch expdir.

Usage:
    python scripts/refrun/run_reference.py train_3d.py \
        --config /abs/cfg.txt [more reference args...]

Driven scripts: train_3d.py, train_3dvid.py,
scripts/script_render_video.py (paths relative to /root/reference).
"""
from __future__ import annotations

import os
import runpy
import sys

REF = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))


def _patch_torch_cpu():
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore
    torch.cuda.manual_seed_all = lambda *a, **k: None
    torch.cuda.empty_cache = lambda: None
    torch.cuda.device_count = lambda: 0
    torch.cuda.synchronize = lambda *a, **k: None
    torch.set_num_threads(max(1, os.cpu_count() or 1))

    # The reference targets torch 1.10; torch>=2.6 flipped torch.load's
    # weights_only default to True, which rejects its own checkpoints
    # (they embed numpy scalars).  Restore the old default for this
    # trusted, locally produced data.
    _load = torch.load

    def _load_legacy(*a, **k):
        k.setdefault("weights_only", False)
        return _load(*a, **k)

    torch.load = _load_legacy


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    script = sys.argv[1]
    script_path = script if os.path.isabs(script) else os.path.join(REF, script)
    if not os.path.exists(script_path):
        raise SystemExit(f"no such reference script: {script_path}")

    # Shims first (configargparse/pytorch3d/...), then the repo (for
    # videoloop3d_tpu.render.raster_cpp), then the reference tree.
    sys.path[:0] = [os.path.join(HERE, "shims"), REPO, REF]
    os.chdir(REF)  # the source-snapshot block reads ./*.py

    _patch_torch_cpu()

    sys.argv = [script_path] + sys.argv[2:]
    runpy.run_path(script_path, run_name="__main__")


if __name__ == "__main__":
    main()
