"""One-process BYOL pretrain batch sweep (post bf16/remat/kernel-flag fix).

Harness in tools/_sweep_common.py (shared with the wav2vec2 sweep).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from _sweep_common import run_sweep  # noqa: E402

CONFIGS = [  # (batch, remat)
    (32, True),
    (48, True),
    (64, True),
    (32, False),
]


def main() -> None:
    from conformer_tpu.train.pretrain import init_byol_state, make_byol_step

    run_sweep(CONFIGS, init_byol_state, make_byol_step)


if __name__ == "__main__":
    main()
