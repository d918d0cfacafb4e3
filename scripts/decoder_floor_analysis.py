"""Hand-counted structural floor for the flagship decoder TRAIN step
(VERDICT r4 #4: 'break 20 ms/step or prove the floor').

Pure analytic model — no TPU, no JAX. Counts the matmul FLOPs and the
irreducible HBM traffic of one train step at the shipping geometry
(batch 32, 384 target tokens, d512/8h/ff1024, 3+3 layers — the geometry of
scripts/bench_decoder_train.py and __graft_entry__._flagship_decoder) and
converts them to per-component speed-of-light milliseconds on one v5e
chip:

    min_ms(component) = max(flops / MXU_peak, bytes / HBM_BW)

Cross-checks: `scripts/roofline.py` measures the XLA cost-analysis FLOPs
of the same step on the real chip; the chain8 D1/D0 stages measure the
anchored ms/step. The structural floor printed here is what those numbers
should be judged against (an end-to-end step cannot beat the sum of its
data movement even at 100% MXU utilization).

Assumptions, marked in the table:
  * bwd matmul FLOPs = 2x fwd (dL/dX and dL/dW), the standard accounting.
  * MXU ceiling 98 TFLOP/s — NOT the nominal 197 TFLOP/s bf16 peak but the
    bf16-input single-pass mode this chip actually measured in the r3
    matmul probe (BENCHMARKS.md "Speed-of-light accounting"); HBM
    819 GB/s (v5e).
  * f32 leaves: params/grads/adam moments move in f32 (the shipping
    config keeps f32 state; only compute is bf16).
  * attention matrices (B,h,L,L) are materialized by the packed Pallas
    kernel once fwd (bf16) and re-read once bwd; the relative bias is
    recomputed in-kernel (log-shift), so NO (B,h,L,L) bias tensor moves
    through HBM — that is the kernel's reason to exist (the XLA arm
    moves a 151 MB f32 bias gradient instead, measured in
    bench_attention_kernels.py).
"""
import json

# ---- v5e chip model ---------------------------------------------------------
MXU_BF16 = 98e12         # FLOP/s (measured bf16-mode ceiling, r3 probe)
HBM_BW = 819e9           # B/s

# ---- shipping geometry ------------------------------------------------------
B = 32                   # batch
E = 96                   # target events
C = 4                    # channels
L = E * C                # 384 decoder tokens
S = 24                   # source code positions (total_upscaling 16)
D = 512                  # d_model
H = 8                    # heads
FF = 1024                # dim_feedforward
V = 62                   # tokens per channel
NEL, NDL = 3, 3          # encoder / decoder layers


def mm(m, k, n):
    """fwd FLOPs of one (m,k)x(k,n) matmul."""
    return 2.0 * m * k * n


def component(name, fwd_flops, hbm_bytes, bwd_factor=3.0):
    """bwd_factor=3: fwd + 2x fwd for the backward pass."""
    flops = fwd_flops * bwd_factor
    return {
        "name": name,
        "tflops": flops / 1e12,
        "mbytes": hbm_bytes / 1e6,
        "ms_compute": 1e3 * flops / MXU_BF16,
        "ms_memory": 1e3 * hbm_bytes / HBM_BW,
    }


def params_count():
    per_dec_layer = (
        3 * D * D + D * D          # qkv + out proj (self)
        + 3 * D * D + D * D        # cross attention
        + D * FF + FF * D          # ffn
        + 2 * L * (D // H)         # relative embeddings (approx)
    )
    per_enc_layer = 3 * D * D + D * D + D * FF + FF * D + 2 * S * (D // H)
    heads = D * C * V
    embeds = C * V * 32 + 16 * D + S * D  # target/source embeddings (approx)
    return NDL * per_dec_layer + NEL * per_enc_layer + heads + embeds


def main():
    comps = []

    # ---- decoder self-attention (the hot path) ------------------------------
    qkv = NDL * mm(B * L, D, 3 * D)
    oproj = NDL * mm(B * L, D, D)
    scores = NDL * 2 * mm(B * H * L, D // H, L)        # QK^T and AV
    relbias = NDL * mm(B * H * L, D // H, 2 * L)       # q . Er^T, 2L offsets
    # HBM: activations in/out per layer (bf16) + attn matrices once fwd,
    # once bwd (bf16) + weights f32 (fwd + grad write + adam read/write
    # folded into the optimizer row)
    act_bytes = NDL * (4 * B * L * D * 2)              # x, qkv out, attn out, resid
    attn_mat_bytes = NDL * (2 * B * H * L * L * 2)     # fwd write+bwd read, bf16
    comps.append(component("dec self-attn matmuls", qkv + oproj + scores,
                           act_bytes))
    comps.append(component("dec rel-bias kernel (in-kernel recompute)",
                           relbias * 2,                 # fwd + bwd recompute
                           attn_mat_bytes, bwd_factor=1.5))

    # ---- decoder FFN ---------------------------------------------------------
    ffn = NDL * (mm(B * L, D, FF) + mm(B * L, FF, D))
    comps.append(component("dec FFN", ffn, NDL * 3 * B * L * D * 2))

    # ---- cross attention (diagonal: each target event sees its block) -------
    xqkv = NDL * (mm(B * L, D, D) + 2 * mm(B * S, D, D) + mm(B * L, D, D))
    xscores = NDL * 2 * mm(B * H * L, D // H, S)
    comps.append(component("cross attention", xqkv + xscores,
                           NDL * 2 * B * L * D * 2))

    # ---- source encoder stack (S=24: negligible) -----------------------------
    enc = NEL * (mm(B * S, D, 4 * D) + 2 * mm(B * H * S, D // H, S)
                 + mm(B * S, D, FF) + mm(B * S, FF, D))
    comps.append(component("source encoder (S=24)", enc, NEL * 3 * B * S * D * 2))

    # ---- fused output heads + stacked-vocab CE -------------------------------
    heads = mm(B * L, D, C * V)
    comps.append(component("fused output heads + CE", heads,
                           B * L * (D + C * V) * 2))

    # ---- optimizer update (pure HBM: f32 params+grads+2 moments r/w) ---------
    P = params_count()
    # 7 f32 passes: read p, read g, m read+write, v read+write, write p
    opt_bytes = P * 4 * (1 + 1 + 2 + 2 + 1)
    comps.append(component("adam update (f32 state)", 0.0, opt_bytes))

    total_ms_serial = sum(max(c["ms_compute"], c["ms_memory"]) for c in comps)
    total_tflops = sum(c["tflops"] for c in comps)
    total_mb = sum(c["mbytes"] for c in comps)

    print(f"{'component':44s} {'TFLOP':>7s} {'MB':>8s} "
          f"{'ms@MXU':>8s} {'ms@HBM':>8s} {'floor':>7s}")
    for c in comps:
        floor = max(c["ms_compute"], c["ms_memory"])
        print(f"{c['name']:44s} {c['tflops']:7.3f} {c['mbytes']:8.1f} "
              f"{c['ms_compute']:8.3f} {c['ms_memory']:8.3f} {floor:7.3f}")
    print("-" * 84)
    print(f"{'TOTAL (serial floor)':44s} {total_tflops:7.3f} {total_mb:8.1f}"
          f" {'':8s} {'':8s} {total_ms_serial:7.3f}")
    print()
    print(json.dumps({
        "params": params_count(),
        "total_tflop_per_step": round(total_tflops, 3),
        "total_hbm_mb_per_step": round(total_mb, 1),
        "structural_floor_ms": round(total_ms_serial, 2),
        "pure_compute_floor_ms": round(1e3 * total_tflops * 1e12 / MXU_BF16, 2),
        "pure_memory_floor_ms": round(1e3 * total_mb * 1e6 / HBM_BW, 2),
    }))


if __name__ == "__main__":
    main()
