#!/usr/bin/env python
"""Batch-size scaling study: does the high-throughput regime reach the
parity schedule's quality? (VERDICT r2 next #8)

Trains the SAME grid model (DR-NMF K=5, r=100) on the same corpus at the
reference's parity batch (32, lr 1e-3 -- enhance.py:616-655) and at the
framework's high-throughput batch (256, lr scaled), then scores both on the
same eval set.  The framework claims nothing caps batch (RESULTS.md
throughput table: 4,093 seq/s at B=256 vs 864 at B=32); this study attaches
a converged-quality data point to that claim.

Usage:
    python scripts/batch_scaling_study.py -d /root/grid_r3_big/params_data_big.yaml \\
        [--epochs 300] [--exp-dir data_setup_bscale]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-d", "--data-config", required=True)
    parser.add_argument("--epochs", type=int, default=300)
    parser.add_argument("--exp-dir", default="data_setup_bscale")
    parser.add_argument("--lr256", type=float, default=3e-3,
                        help="lr for B=256 (~sqrt(8)x the parity 1e-3)")
    parser.add_argument("--no-pesq", action="store_true")
    args = parser.parse_args()

    from drnmf_tpu import cli
    from drnmf_tpu.utils import config_hash, dump_yaml

    base = {
        "K_layers": 5,
        "r": 100,
        "alph": 50.0,
        "lam1": 1.0,
        "clipnorm": 0.0,
        "loss": "mse_of_masked",
        "optimizer": "adam",
        "params_trainable": ["log_D", "log_alph"],
        "params_untied": ["log_D", "log_alph"],
        "patience": 10**6,  # fixed-epoch comparison: no early stop
        "snmf_max_iter": 200,
        "snmf_conv_eps": 1e-4,
        "epochs": args.epochs,
        "resume": True,
    }
    runs = [
        dict(base, batch_size=32, learning_rate=1e-3),
        dict(base, batch_size=256, learning_rate=args.lr256),
    ]
    os.makedirs(os.path.join(args.exp_dir, "configs"), exist_ok=True)
    for cfg in runs:
        h = config_hash(cfg, exclude=("resume",))
        path = os.path.join(args.exp_dir, "configs",
                            f"params_unfolded_snmf_{h}.yaml")
        dump_yaml(cfg, path)
        print(f"== batch {cfg['batch_size']} lr {cfg['learning_rate']}: {path}")
        t0 = time.time()
        argv = ["-c", path, "-d", args.data_config,
                "--exp-dir", args.exp_dir, "--splits", "valid"]
        if args.no_pesq:
            argv.append("--no-pesq")
        cli.main(argv)
        print(f"== batch {cfg['batch_size']} wall: {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
