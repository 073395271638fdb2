"""Every shipped scene config must land on a supported parallel path.

VERDICT r4 item 6: the fp (frame-sharded) step has written capability
gates (parallel/fp_step.py:fp_supports) — gpnn_down, the ssim patch
distance, stridet != 1, and non-loop configs fall back to dp.  The
gates are honest and unit-tested, but nothing verified the SHIPPED
scene configs (configs/mpvs/*.txt + base) all land on a supported
path, so a future scene file with ``swd_dist_fn = ssim`` or
``stridet = 2`` could silently halve the mesh.

This test parses each shipped config exactly like tools/train_3dvid.py
does and asserts both per-view loss configs (ref + other,
train/stage2.py:loss_config_from_args, ref train_3dvid.py:160-192)
are fp-ok — or appear in the explicit INTENTIONALLY_DP_ONLY allowlist
with a reason.  Adding a dp-only scene config is allowed, but it must
be a visible decision here, not an accident.

The committed support matrix lives in PARITY.md ("Parallel-path
support matrix").
"""
import glob
import os

import pytest

from videoloop3d_tpu import config as C
from videoloop3d_tpu.parallel.fp_step import fp_supports
from videoloop3d_tpu.train.stage2 import loss_config_from_args

REPO = os.path.join(os.path.dirname(__file__), "..")
CONFIGS = os.path.join(REPO, "configs")

# scene-config basename -> reason it is intentionally dp-only.
# Empty today: every shipped scene must ride the full dp x fp mesh.
INTENTIONALLY_DP_ONLY = {}

MPV_SCENES = sorted(glob.glob(os.path.join(CONFIGS, "mpvs", "*.txt")))
MPI_SCENES = sorted(glob.glob(os.path.join(CONFIGS, "mpis", "*.txt")))
EXTRA_S2 = [os.path.join(CONFIGS, n) for n in
            ("debug_synthetic_s2.txt", "soak_synthetic_s2.txt")]


def _parse_stage2(scene_path):
    return C.parse_args_with_configs(
        ["--config", os.path.join(CONFIGS, "mpv_base.txt"),
         "--config1", scene_path])


@pytest.mark.parametrize("scene", MPV_SCENES + EXTRA_S2,
                         ids=lambda p: os.path.basename(p))
def test_shipped_stage2_config_is_fp_supported(scene):
    args = _parse_stage2(scene)
    isloop = bool(getattr(args, "mpv_isloop", False))
    name = os.path.basename(scene)
    for ref in (False, True):
        losscfg = loss_config_from_args(args, ref=ref)
        ok, reason = fp_supports(losscfg, isloop=isloop)
        if name in INTENTIONALLY_DP_ONLY:
            assert not ok, (
                f"{name} is allowlisted dp-only but fp_supports now "
                f"accepts it — remove it from INTENTIONALLY_DP_ONLY")
        else:
            assert ok, (
                f"{name} ({'ref' if ref else 'other'}-view loss "
                f"{losscfg['loss_name']}) silently falls back to "
                f"dp-only: {reason}.  Either fix the config or add it "
                f"to INTENTIONALLY_DP_ONLY with a reason.")


@pytest.mark.parametrize("scene", MPI_SCENES,
                         ids=lambda p: os.path.basename(p))
def test_shipped_stage1_config_parses(scene):
    # Stage 1 has no fp path (single static atlas; parallelism is dp
    # over the patch batch + --shard_views) — the invariant to pin is
    # that every shipped stage-1 scene config still parses against the
    # shipped base config.
    args = C.parse_args_with_configs(
        ["--config", os.path.join(CONFIGS, "mpi_base.txt"),
         "--config1", scene])
    assert args.mpi_d > 0 and args.expname


def test_support_matrix_documented_in_parity():
    with open(os.path.join(REPO, "PARITY.md")) as f:
        text = f.read()
    assert "Parallel-path support matrix" in text, (
        "PARITY.md must carry the committed parallel-path support "
        "matrix (VERDICT r4 item 6)")
