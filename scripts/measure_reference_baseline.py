"""Measure the PyTorch reference's encoder-training throughput on CPU.

BASELINE.md: the reference publishes no numbers, so the baseline must be
measured. This instantiates the reference's own modules (from
/root/reference, read-only) at the default encoder_random_config geometry
(batch 16, 16-token blocks, 6+6 blocks, 15 random negatives,
VQCPCB/configs/encoder_random_config.py) and times its training hot loop
(vqcpc_encoder_trainer.py:169-354) on random token batches — the identical
workload bench.py runs on TPU. Writes baseline_measured.json at the repo
root.

Run:  python scripts/measure_reference_baseline.py
"""
import argparse
import json
import os
import sys
import time

REFERENCE = "/root/reference"
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--num-batches", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--vocab", type=int, default=62)
    args = parser.parse_args()

    sys.path.insert(0, REFERENCE)
    import numpy as np
    import torch

    from VQCPCB.data_processor.bach_cpc_data_processor import BachCPCDataProcessor
    from VQCPCB.downscalers.lstm_downscaler import LstmDownscaler
    from VQCPCB.quantizer.vector_quantizer import ProductVectorQuantizer
    from VQCPCB.upscalers.mlp_upscaler import MlpUpscaler
    from VQCPCB import vqcpc_helper
    from VQCPCB.vqcpc_helper import nce_loss, quantization_loss
    from VQCPCB.encoder import Encoder

    torch.manual_seed(0)
    rng = np.random.RandomState(0)

    # encoder_random_config geometry
    num_tokens_per_block = 16
    num_blocks_left = num_blocks_right = 6
    num_negative_samples = 15
    embedding_size = 32
    codebook_dim = 3
    codebook_size = 32
    B = args.batch_size
    V = args.vocab
    ticks_lr = num_blocks_left * num_tokens_per_block // 4
    ticks_block = num_tokens_per_block // 4

    data_processor = BachCPCDataProcessor(
        embedding_size=embedding_size, num_events=ticks_lr * 2,
        num_channels=4, num_tokens_per_channel=[V] * 4,
        num_tokens_per_block=num_tokens_per_block)
    downscaler = LstmDownscaler(
        input_dim=embedding_size, output_dim=codebook_dim, num_channels=4,
        downscale_factors=[num_tokens_per_block], hidden_size=512,
        num_layers=2, dropout=0.1, bidirectional=True)
    quantizer = ProductVectorQuantizer(
        codebook_size=codebook_size, codebook_dim=codebook_dim,
        commitment_cost=0.25, num_codebooks=1, use_batch_norm=False,
        initialize=False, squared_l2_norm=True)
    upscaler = MlpUpscaler(input_dim=codebook_dim, output_dim=32,
                           hidden_size=512, dropout=0.1)
    encoder = Encoder(model_dir="/tmp/ref_bench", data_processor=data_processor,
                      downscaler=downscaler, quantizer=quantizer,
                      upscaler=upscaler)
    c_module = vqcpc_helper.CModule(input_dim=32, hidden_size=512,
                                    output_dim=32, num_layers=2, dropout=0.1)
    fks_module = vqcpc_helper.FksModule(z_dim=32, c_dim=32,
                                        k_max=num_blocks_right)

    params = (list(c_module.parameters()) + list(fks_module.parameters())
              + list(encoder.parameters()))
    optimizer = torch.optim.Adam(params, lr=1e-4)
    encoder.train(); c_module.train(); fks_module.train()

    def make_batch():
        return {
            "x_left": torch.from_numpy(
                rng.randint(0, V, size=(B, ticks_lr, 4))).long(),
            "x_right": torch.from_numpy(
                rng.randint(0, V, size=(B, ticks_lr, 4))).long(),
            "negative_samples": torch.from_numpy(rng.randint(
                0, V, size=(B, num_negative_samples, num_blocks_right,
                            ticks_block, 4))).long(),
        }

    batches = [make_batch() for _ in range(4)]
    tokens_per_batch = (2 * B * ticks_lr * 4
                        + B * num_negative_samples * num_blocks_right
                        * ticks_block * 4)

    def step(batch):
        # the reference hot loop, vqcpc_encoder_trainer.py:194-316
        negative_samples = batch["negative_samples"]
        bs, n_neg, fks_dim, num_events, num_channels = negative_samples.shape
        neg_flat = negative_samples.view(bs * n_neg * fks_dim, num_events,
                                         num_channels)
        z_q_neg, _, qloss_neg = encoder(neg_flat, corrupt_labels=False)
        _, num_blocks, dim_z = z_q_neg.shape
        z_q_neg = z_q_neg.view(bs, n_neg, fks_dim, num_blocks, dim_z)
        qloss_neg = qloss_neg.view(bs, n_neg, fks_dim, num_blocks)
        z_left, _, qloss_left = encoder(batch["x_left"], corrupt_labels=False)
        z_right, _, qloss_right = encoder(batch["x_right"], corrupt_labels=False)
        c = c_module(z_left, h=None)
        fks_positive = fks_module(c, z_right)
        z_q_neg = z_q_neg[:, :, :, 0, :]
        z_q_neg = z_q_neg.permute(1, 0, 2, 3).contiguous().view(
            bs * n_neg, fks_dim, dim_z)
        c_repeat = c.repeat(n_neg, 1)
        fks_negative = fks_module(c_repeat, z_q_neg)
        fks_negative = fks_negative.view(n_neg, bs, fks_dim) \
            .contiguous().permute(1, 2, 0)
        contrastive = nce_loss(fks_positive, fks_negative)
        q_loss = quantization_loss(qloss_left, qloss_neg, qloss_right)
        loss = contrastive + 0.5 * q_loss
        optimizer.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(params, 5)
        optimizer.step()
        return float(loss)

    for i in range(args.warmup):
        step(batches[i % len(batches)])
    t0 = time.perf_counter()
    for i in range(args.num_batches):
        step(batches[i % len(batches)])
    elapsed = time.perf_counter() - t0
    tokens_per_sec = tokens_per_batch * args.num_batches / elapsed

    result = {
        "encoder_train_tokens_per_sec_cpu": tokens_per_sec,
        "steps_per_sec_cpu": args.num_batches / elapsed,
        "tokens_per_batch": tokens_per_batch,
        "batch_size": B,
        "torch_threads": torch.get_num_threads(),
        "geometry": "encoder_random_config (16-token blocks, 6+6, 15 neg)",
    }
    out_path = os.path.join(REPO_ROOT, "baseline_measured.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
