"""One-process wav2vec2 pretrain batch sweep (post matmul-form InfoNCE).

Harness in tools/_sweep_common.py (shared with the BYOL sweep).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from _sweep_common import run_sweep  # noqa: E402

CONFIGS = [  # (batch, remat)
    (32, True),
    (32, False),
    (48, True),
    (48, False),
    (64, True),
]


def main() -> None:
    from conformer_tpu.train.pretrain import (gumbel_temperature_at,
                                              init_wav2vec2_state,
                                              make_wav2vec2_step)

    run_sweep(CONFIGS, init_wav2vec2_state, make_wav2vec2_step,
              step_extras=lambda cfg: (gumbel_temperature_at(cfg, 0),))


if __name__ == "__main__":
    main()
