"""Shared CLI plumbing: config loading + dotted overrides + device/mesh setup.

Replaces the reference's 40-flag-per-entry-point duplication
(reference: train.py:289-342, test.py:176-211, infer.py:157-187) with
``--config cfg.json`` plus ``--set section.key=value`` overrides shared by
every entry point.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List, Optional

import jax

from conformer_tpu.config import Config
from conformer_tpu.parallel.mesh import make_mesh


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", default=None,
                   help="path to a Config JSON (default: "
                        "<checkpoint-dir>/config.json when present — "
                        "training writes it, so downstream CLIs pick up "
                        "the trained model shape automatically)")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="dotted config override, e.g. --set model.d_model=256")
    p.add_argument("--tokenizer", default=None,
                   help="tokenizer spec name or path (vi, en, or a JSON "
                        "path); defaults to train.tokenizer_path, then 'vi'")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel mesh size (0 = all devices / tp)")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel mesh size")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() before device use")


def parse_value(raw: str):
    try:
        return json.loads(raw)
    except json.JSONDecodeError:
        return raw


def load_config(args: argparse.Namespace) -> Config:
    """--config wins; otherwise <checkpoint-dir>/config.json when present
    (cli.train / cli.pretrain persist it — see save_config), so evaluating /
    transcribing / serving a non-default model needs no repeated --set
    flags; --set overrides apply on top either way. The reference had no
    config files at all (SURVEY §5): its 40 model flags had to be retyped
    identically on every entry point or the checkpoint silently mismatched."""
    path = args.config
    ck_dir = getattr(args, "checkpoint_dir", None)
    if path is None and ck_dir:
        cand = os.path.join(ck_dir, "config.json")
        if os.path.exists(cand):
            path = cand
            print(f"[config] using {cand}")
    cfg = Config.from_json(path) if path else Config()
    overrides = {}
    for item in args.overrides:
        if "=" not in item:
            raise SystemExit(f"--set expects KEY=VALUE, got {item!r}")
        key, raw = item.split("=", 1)
        overrides[key] = parse_value(raw)
    if overrides:
        cfg = cfg.override(**overrides)
    return cfg


def save_config(cfg: Config, directory: Optional[str]) -> None:
    """Persist the composed config next to the checkpoints (process 0 only)
    so checkpoint-consuming CLIs can reconstruct the exact model shape —
    see load_config. Never overwrites an explicit file with identical
    content churn; resume runs keep their original config unless flags
    change it."""
    if not directory or jax.process_index() != 0:
        return
    os.makedirs(directory, exist_ok=True)
    cfg.to_json(os.path.join(directory, "config.json"))


def setup_mesh(args: argparse.Namespace):
    """-> mesh or None (single device). Initializes multi-host first if asked.

    ``--dp 1 --tp 1`` forces single-device even on a multi-chip host; an
    explicit dp*tp smaller than the device count uses the first dp*tp
    devices (useful for ablations and the virtual-device test mesh)."""
    if args.multihost:
        jax.distributed.initialize()
    devices = jax.devices()
    dp = args.dp or len(devices) // args.tp
    if dp * args.tp == 1:
        return None
    if dp * args.tp < len(devices):
        devices = devices[: dp * args.tp]
    return make_mesh(dp=dp, tp=args.tp, devices=devices)


def load_tokenizer_from_args(args: argparse.Namespace,
                             cfg: Optional[Config] = None):
    """CLI flag wins, then ``cfg.train.tokenizer_path``, then 'vi' (the
    reference's default language — reference: train.py:297)."""
    from conformer_tpu.text.tokenizer import load_tokenizer

    name = args.tokenizer
    if name is None and cfg is not None:
        name = cfg.train.tokenizer_path
    return load_tokenizer(name or "vi")
