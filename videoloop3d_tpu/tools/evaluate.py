"""Evaluation CLI (counterpart of reference scripts/script_evaluate_ours.py).

    python -m videoloop3d_tpu.tools.evaluate --config ... --config1 ...
"""
from __future__ import annotations

import numpy as np

from videoloop3d_tpu.config import parse_args_with_configs
from videoloop3d_tpu.eval.evaluate import evaluate


def main(argv=None):
    args = parse_args_with_configs(argv)
    np.random.seed(args.seed)
    evaluate(args)


if __name__ == "__main__":
    main()
