"""Analytic communication model: projected multi-chip scaling efficiency.

Real multi-chip hardware is unavailable in this environment, and the
CPU-virtual-device "scaling" numbers in tools/scaling_sim_results.jsonl are
host-contention artifacts (correctness-only). This model projects DP/TP
efficiency from first principles instead: measured single-chip step times
(tools/sweep_results.jsonl) + exact per-step collective volumes + public
TPU v5e interconnect specs.

Collective cost model (jax-ml.github.io/scaling-book): a bidirectional-ring
all-reduce of V bytes over one ICI axis moves 2·V·(N-1)/N bytes per chip,
split across the axis' two link directions, so
    t_allreduce ≈ 2 · V · (N-1)/N / (2 · BW_link) = V · (N-1)/N / BW_link
independent of N for large N.

Volumes:
- DP gradient psum: V = P_grad · 4 bytes (fp32 grads, one psum/step).
- TP activation all-reduces (Megatron pattern): per encoder block, the
  row-parallel output matmuls of ffn1, attention-out, conv-pointwise2 and
  ffn2 each psum a (B_local, L, D) bf16 activation in forward AND backward
  → 8 · B_local · L · D · 2 bytes per block.

Overlap: XLA overlaps the gradient psum with remaining backward compute;
we report both overlap=0 (worst case) and overlap=0.7 (typical fraction of
the psum hidden under the backward, which is >70% of the step).

    python tools/comm_model.py [--markdown]
"""

from __future__ import annotations

import argparse

# --- measured inputs (single TPU v5e chip; tools/sweep_results.jsonl) -------
P_GRAD = 118_048_114          # prod CTC params (17 blocks, d512, vocab 370)
OPERATING_POINTS = {
    # name: (batch, audio_s, audio_s_per_s measured, L frames post-subsample)
    # r5 numbers: 8s b56 headline 3977; 24s b32 remat + auto-stft 3181.
    # Faster steps make the gradient psum RELATIVELY larger, so these are
    # the conservative direction to refresh in.
    "8s":  (56, 8.0, 3977.0, 199),
    "24s": (32, 24.0, 3181.0, 599),
}
D_MODEL = 512
N_BLOCKS = 17

# --- hardware assumptions (public TPU v5e specs) -----------------------------
# 4 ICI links/chip at 45 GB/s one-way each, 2D torus; one DP ring uses one
# axis (2 links, one per direction). Slices up to 256 chips are all-ICI;
# DCN only enters beyond a slice (not modeled here).
ICI_LINK_BW = 45e9            # bytes/s, one direction of one link
OVERLAPS = (0.0, 0.7)


def allreduce_time(v_bytes: float, n: int, bw=ICI_LINK_BW) -> float:
    if n <= 1:
        return 0.0
    return v_bytes * (n - 1) / n / bw


def dp_rows(chips=(8, 16, 32)):
    rows = []
    grad_bytes = P_GRAD * 4
    for name, (batch, audio_s, tput, _l) in OPERATING_POINTS.items():
        t_step = batch * audio_s / tput
        for n in chips:
            t_comm = allreduce_time(grad_bytes, n)
            for ov in OVERLAPS:
                exposed = t_comm * (1 - ov)
                eff = t_step / (t_step + exposed)
                rows.append({
                    "point": name, "chips": n, "parallelism": "DP",
                    "psum_mb": grad_bytes / 1e6,
                    "t_step_ms": t_step * 1e3, "t_comm_ms": t_comm * 1e3,
                    "overlap": ov, "efficiency": eff,
                })
    return rows


def tp_rows(tp=2, dp=4):
    """DP x TP on 8 chips: adds per-block activation all-reduces."""
    rows = []
    grad_bytes = P_GRAD * 4 / tp  # grads sharded over model axis too
    for name, (batch, audio_s, tput, l) in OPERATING_POINTS.items():
        t_step = batch * audio_s / tput
        b_local = batch / dp
        act_bytes = 8 * b_local * l * D_MODEL * 2 * N_BLOCKS
        t_act = allreduce_time(act_bytes, tp)
        t_grad = allreduce_time(grad_bytes, dp)
        for ov in OVERLAPS:
            exposed = t_grad * (1 - ov) + t_act  # activation psums are on
            # the critical path (each feeds the next op); only grads overlap
            eff = t_step / (t_step + exposed)
            rows.append({
                "point": name, "chips": dp * tp,
                "parallelism": f"DP{dp}xTP{tp}",
                "psum_mb": (grad_bytes + act_bytes) / 1e6,
                "t_step_ms": t_step * 1e3,
                "t_comm_ms": (t_grad + t_act) * 1e3,
                "overlap": ov, "efficiency": eff,
            })
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--markdown", action="store_true")
    args = p.parse_args()
    rows = dp_rows() + tp_rows()
    if args.markdown:
        print("| point | chips | mode | psum MB/step | step ms | comm ms "
              "| overlap | proj. efficiency |")
        print("|---|---|---|---|---|---|---|---|")
        for r in rows:
            print(f"| {r['point']} | {r['chips']} | {r['parallelism']} "
                  f"| {r['psum_mb']:.0f} | {r['t_step_ms']:.1f} "
                  f"| {r['t_comm_ms']:.2f} | {r['overlap']:.0%} "
                  f"| {r['efficiency']:.1%} |")
    else:
        import json
        for r in rows:
            print(json.dumps(r))


if __name__ == "__main__":
    main()
