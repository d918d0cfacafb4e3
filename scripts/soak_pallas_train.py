"""Quality soak for the fused custom-VJP training attention.

Trains the same decoder config twice on the TPU — XLA attention vs
VQCPCB_PALLAS_ATTENTION_TRAIN=1 — from identical seeds, and compares the
per-epoch loss curves. Gradient parity is already hardware-verified
elementwise (scripts/check_pallas_train_tpu.py); this checks nothing drifts
over a real optimization trajectory (dropout streams differ by design, so
curves must track within noise, not bit-match).

Run ON the TPU (one axon client at a time):
    python scripts/soak_pallas_train.py [num_epochs]
"""
import glob
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIG = """
from pathlib import Path
config = {
    'config_encoder': %(enc)r,
    'training_method': 'decoder',
    'dataset': 'synthetic',
    'corpus_kwargs': dict(num_chorales=64, min_beats=16, max_beats=48, seed=0),
    'dataloader_generator_kwargs': dict(sequences_size=6),
    'data_processor_type': 'bach',
    'data_processor_kwargs': dict(embedding_size=32),
    'decoder_type': 'transformer_relative_diagonal',
    'decoder_kwargs': dict(d_model=256, num_encoder_layers=2,
                           num_decoder_layers=2, n_head=8,
                           dim_feedforward=1024,
                           positional_embedding_size=8, dropout=0.1),
    'lr': 1e-4, 'schedule_lr': False, 'batch_size': 16, 'num_batches': 48,
    'num_epochs': %(epochs)d,
    'timestamp': None,
    'savename': Path(__file__).stem,
}
"""


def run_arm(workdir, name, env_extra, epochs, enc_cfg):
    cfg_path = os.path.join(workdir, "configs", f"{name}.py")
    open(cfg_path, "w").write(CONFIG % dict(enc=enc_cfg, epochs=epochs))
    env = dict(os.environ, **env_extra)
    # PREPEND the repo: this image loads its TPU plugin via PYTHONPATH
    # (/root/.axon_site) — replacing the variable silently drops the backend
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "main_decoder.py"),
         "-t", "-c", cfg_path],
        cwd=workdir, env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    md = sorted(glob.glob(os.path.join(workdir, "models", f"{name}_*")))[-1]
    losses = []
    for line in open(os.path.join(md, "metrics.jsonl")):
        rec = json.loads(line)
        losses.append((rec["loss/train"], rec["loss/val"]))
    return losses


def main():
    # soak_pallas_train.py [num_epochs] [--relbias]
    #   default:   XLA attention vs fused kernel (skew in XLA)
    #   --relbias: fused kernel vs fused kernel + in-kernel skew
    #              (VQCPCB_PALLAS_RELBIAS=1) — the default-flip evidence
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    relbias = "--relbias" in sys.argv[1:]
    compute_bf16 = "--compute-bf16" in sys.argv[1:]
    epochs = int(args[0]) if args else 3
    workdir = tempfile.mkdtemp(prefix="soak_pallas")
    os.makedirs(os.path.join(workdir, "configs"))
    # tiny encoder the decoder trains against
    enc_smoke = os.path.join(REPO, "tests", "configs", "encoder_smoke.py")
    if compute_bf16:
        # mixed-precision adjudication: f32 activations vs bf16 activations
        # (VQCPCB_COMPUTE_DTYPE — params stay f32 in both arms), everything
        # else at current defaults. Decides whether the decoder trainer can
        # default to bf16 dense compute.
        xla = run_arm(workdir, "xla", {"VQCPCB_COMPUTE_DTYPE": ""},
                      epochs, enc_smoke)
        pallas = run_arm(workdir, "pallas",
                         {"VQCPCB_COMPUTE_DTYPE": "bfloat16"},
                         epochs, enc_smoke)
    elif relbias:
        base = {"VQCPCB_PALLAS_ATTENTION_TRAIN": "1"}
        xla = run_arm(workdir, "xla", dict(base, VQCPCB_PALLAS_RELBIAS="0"),
                      epochs, enc_smoke)
        pallas = run_arm(workdir, "pallas",
                         dict(base, VQCPCB_PALLAS_RELBIAS="1"),
                         epochs, enc_smoke)
    else:
        # pin the skew OFF in both arms: since the r4 default flip the bare
        # fused kernel would otherwise silently run the in-kernel skew and
        # this mode would no longer measure what its name claims
        xla = run_arm(workdir, "xla", {"VQCPCB_PALLAS_ATTENTION_TRAIN": "0",
                                       "VQCPCB_PALLAS_RELBIAS": "0"},
                      epochs, enc_smoke)
        pallas = run_arm(workdir, "pallas",
                         {"VQCPCB_PALLAS_ATTENTION_TRAIN": "1",
                          "VQCPCB_PALLAS_RELBIAS": "0"},
                         epochs, enc_smoke)
    print(json.dumps({"xla": xla, "pallas": pallas}))
    for (xt, xv), (pt, pv) in zip(xla, pallas):
        rel = abs(pt - xt) / max(abs(xt), 1e-9)
        print(f"train {xt:.4f} vs {pt:.4f} (rel {rel:.3f})   "
              f"val {xv:.4f} vs {pv:.4f}")
        assert rel < 0.05, "fused-train attention diverged from XLA path"
    print("SOAK OK: fused training attention tracks the XLA path")


if __name__ == "__main__":
    main()
