"""Import a reference (PyTorch) Conformer checkpoint into conformer_tpu params.

Maps the reference model's state dict (reference: model/conformer.py:9-27 and
submodules; checkpoint format from manager.py:33-49 — {'model': state_dict,
...}) onto this framework's Flax parameter tree, handling the layout
differences:

- Conv2d subsampling: torch (out, in, kF, kT) over (B, 1, mels, T) -> flax
  NHWC (kT, kF, in, out) over (B, T, mels, 1) (spatial transpose);
- post-subsampling flatten order: reference is channel-major
  (idx = c*F' + f, encoder.py:23 after convolution.py:49-52), ours is
  freq-major (idx = f*d + c) — the input projection's rows are permuted;
- Linear (out, in) -> Dense kernel (in, out) transposes;
- depthwise Conv1d (C, 1, K) -> (K, 1, C);
- LSTM: W_ih/W_hh transpose, torch's two biases summed (same i,f,g,o gate
  order);
- BatchNorm running stats -> batch_stats collection.

Usage:
    python tools/import_torch_checkpoint.py ref.pt out_ckpt_dir \
        [--vocab-size 370] [--n-blocks 17] ...
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _t(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32).T


def _block_params(sd: Dict[str, np.ndarray], pfx: str) -> Tuple[dict, dict]:
    """One ConformerBlock: reference prefix e.g. 'encoder.layers.3.'."""
    p = {}
    bs = {}
    for i, name in ((1, "ffn1"), (2, "ffn2")):
        p[name] = {
            "LayerNorm_0": {"scale": sd[f"{pfx}ffn_{i}.layer_norm.weight"],
                            "bias": sd[f"{pfx}ffn_{i}.layer_norm.bias"]},
            "hidden": {"kernel": _t(sd[f"{pfx}ffn_{i}.hidden_linear.weight"]),
                       "bias": sd[f"{pfx}ffn_{i}.hidden_linear.bias"]},
            "out": {"kernel": _t(sd[f"{pfx}ffn_{i}.out_linear.weight"]),
                    "bias": sd[f"{pfx}ffn_{i}.out_linear.bias"]},
        }
    a = f"{pfx}attention.attention."
    p["mhsa"] = {
        "LayerNorm_0": {"scale": sd[f"{pfx}attention.layer_norm.weight"],
                        "bias": sd[f"{pfx}attention.layer_norm.bias"]},
        "attention": {
            "query": {"kernel": _t(sd[a + "query_proj.weight"]),
                      "bias": sd[a + "query_proj.bias"]},
            "key": {"kernel": _t(sd[a + "key_proj.weight"]),
                    "bias": sd[a + "key_proj.bias"]},
            "value": {"kernel": _t(sd[a + "value_proj.weight"]),
                      "bias": sd[a + "value_proj.bias"]},
            "pos": {"kernel": _t(sd[a + "pos_proj.weight"]),
                    "bias": sd[a + "pos_proj.bias"]},
            "out": {"kernel": _t(sd[a + "out_proj.weight"]),
                    "bias": sd[a + "out_proj.bias"]},
            "content_bias": np.asarray(sd[a + "content_bias"], np.float32),
            "position_bias": np.asarray(sd[a + "position_bias"], np.float32),
        },
    }
    c = f"{pfx}conv."
    dw = np.asarray(sd[c + "deepwise_conv.weight"], np.float32)  # (C,1,K)
    p["conv"] = {
        "LayerNorm_0": {"scale": sd[c + "layer_norm.weight"],
                        "bias": sd[c + "layer_norm.bias"]},
        "pointwise1": {"kernel": _t(sd[c + "pointwise_conv_1.weight"][:, :, 0]),
                       "bias": sd[c + "pointwise_conv_1.bias"]},
        "depthwise": {"kernel": dw.transpose(2, 1, 0),
                      "bias": sd[c + "deepwise_conv.bias"]},
        "norm": {"scale": sd[c + "batch_norm.weight"],
                 "bias": sd[c + "batch_norm.bias"]},
        "pointwise2": {"kernel": _t(sd[c + "pointwise_conv_2.weight"][:, :, 0]),
                       "bias": sd[c + "pointwise_conv_2.bias"]},
    }
    bs["conv"] = {"norm": {"mean": sd[c + "batch_norm.running_mean"],
                           "var": sd[c + "batch_norm.running_var"]}}
    p["final_norm"] = {"scale": sd[f"{pfx}layer_norm.weight"],
                       "bias": sd[f"{pfx}layer_norm.bias"]}
    return p, bs


def convert_state_dict(sd: Dict[str, np.ndarray], n_blocks: int,
                       d_model: int, n_mels: int = 80,
                       scan_layers: bool = True) -> Tuple[dict, dict]:
    """reference state_dict -> (params, batch_stats) trees for Conformer."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    f_sub = ((n_mels - 1) // 2 - 1) // 2

    def conv2d(w):  # (out, in, kF, kT) -> (kT, kF, in, out)
        return np.transpose(w, (3, 2, 1, 0))

    enc = {
        "subsample": {
            "conv1": {"kernel": conv2d(sd["encoder.downsampling_conv.conv_1.weight"]),
                      "bias": sd["encoder.downsampling_conv.conv_1.bias"]},
            "conv2": {"kernel": conv2d(sd["encoder.downsampling_conv.conv_2.weight"]),
                      "bias": sd["encoder.downsampling_conv.conv_2.bias"]},
        },
    }
    # Input projection with flatten-order permutation: our input index
    # f*d + c  <->  reference input index c*F' + f.
    w = _t(sd["encoder.linear.weight"])            # (d*F', d) reference order
    perm = np.empty(d_model * f_sub, np.int64)
    for f in range(f_sub):
        for c in range(d_model):
            perm[f * d_model + c] = c * f_sub + f
    enc["input_proj"] = {"kernel": w[perm], "bias": sd["encoder.linear.bias"]}

    blocks = []
    blocks_bs = []
    for i in range(n_blocks):
        p, bs = _block_params(sd, f"encoder.layers.{i}.")
        blocks.append(p)
        blocks_bs.append(bs)

    if scan_layers:
        import jax

        stacked = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs, axis=0), *blocks)
        stacked_bs = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs, axis=0), *blocks_bs)
        enc["blocks"] = {"block": stacked}
        enc_bs = {"blocks": {"block": stacked_bs}}
    else:
        for i, (p, bs) in enumerate(zip(blocks, blocks_bs)):
            enc[f"block_{i}"] = p
        enc_bs = {f"block_{i}": bs for i, bs in enumerate(blocks_bs)}

    dec = {
        "lstm_0": {
            "input_proj": {"kernel": _t(sd["decoder.lstm.weight_ih_l0"]),
                           "bias": (sd["decoder.lstm.bias_ih_l0"]
                                    + sd["decoder.lstm.bias_hh_l0"])},
            "recurrent_kernel": _t(sd["decoder.lstm.weight_hh_l0"]),
        },
        "norm": {"scale": sd["decoder.norm.weight"],
                 "bias": sd["decoder.norm.bias"]},
        "classifier": {"kernel": _t(sd["decoder.linear.weight"]),
                       "bias": sd["decoder.linear.bias"]},
    }
    dec_bs = {"norm": {"mean": sd["decoder.norm.running_mean"],
                       "var": sd["decoder.norm.running_var"]}}

    params = {"encoder": enc, "decoder": dec}
    batch_stats = {"encoder": enc_bs, "decoder": dec_bs}
    return params, batch_stats


def strip_ddp_prefix(sd: Dict) -> Dict:
    """Handle DDP 'module.'-prefixed checkpoints (reference: checkpoint.py:7-25)."""
    if all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("torch_ckpt", help=".pt file (CheckpointManager format or raw state_dict)")
    p.add_argument("out_dir")
    p.add_argument("--vocab-size", type=int, default=370)
    p.add_argument("--n-blocks", type=int, default=17)
    p.add_argument("--d-model", type=int, default=512)
    p.add_argument("--n-heads", type=int, default=8)
    p.add_argument("--kernel-size", type=int, default=31)
    p.add_argument("--lstm-hidden", type=int, default=640)
    args = p.parse_args()

    import torch

    raw = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    sd = raw.get("model", raw) if isinstance(raw, dict) else raw
    sd = strip_ddp_prefix({k: v.numpy() for k, v in sd.items()})

    import jax
    import jax.numpy as jnp

    from conformer_tpu.config import Config
    from conformer_tpu.train.checkpoint import CheckpointManager
    from conformer_tpu.train.state import TrainState, make_optimizer

    cfg = Config().override(**{
        "model.vocab_size": args.vocab_size, "model.n_blocks": args.n_blocks,
        "model.d_model": args.d_model, "model.n_heads": args.n_heads,
        "model.kernel_size": args.kernel_size,
        "model.lstm_hidden_dim": args.lstm_hidden})
    params, batch_stats = convert_state_dict(sd, args.n_blocks, args.d_model,
                                             cfg.model.n_mel_channels,
                                             cfg.model.use_scan_layers)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
    tx = make_optimizer(cfg.optim)
    state = TrainState.create(params, batch_stats, tx)
    mgr = CheckpointManager(args.out_dir, keep=1)
    mgr.save(state, epoch=0, force=True)
    mgr.wait()
    cfg.to_json(os.path.join(args.out_dir, "config.json"))
    print(f"imported {len(sd)} tensors -> {args.out_dir}")


if __name__ == "__main__":
    main()
