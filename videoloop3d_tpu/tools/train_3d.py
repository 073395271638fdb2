"""Stage-1 training CLI (counterpart of reference train_3d.py).

    python -m videoloop3d_tpu.tools.train_3d --config <base> --config1 <scene>
"""
from __future__ import annotations

import numpy as np

from videoloop3d_tpu.backend import apply_backend_from_args
from videoloop3d_tpu.config import parse_args_with_configs


def main(argv=None):
    args = parse_args_with_configs(argv)
    apply_backend_from_args(args)
    # multi-host: join the coordination service before the backend
    # initializes (no-op for single-process runs)
    from videoloop3d_tpu.parallel.distributed import maybe_init_from_args
    maybe_init_from_args(args)
    from videoloop3d_tpu.train import common, stage1

    np.random.seed(args.seed)
    stage1.train(args)
    if common.graceful_shutdown().requested:
        # EX_TEMPFAIL: the run checkpointed and can resume; schedulers
        # and run_all.sh must not treat the scene as finished
        raise SystemExit(75)


if __name__ == "__main__":
    main()
