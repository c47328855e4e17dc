#!/usr/bin/env python
"""Enhance wav files with a trained DR-NMF checkpoint.

Production-style direct inference (no experiment pipeline): loads a model
config YAML + checkpoint, batches the inputs through the fused on-device
enhance program (drnmf_tpu.enhance), and writes enhanced wavs.

Usage:
    # single file
    python scripts/enhance_wav.py -c params_unfolded_snmf_<hash>.yaml \\
        -m model_unfolded_snmf_<hash>.npz noisy.wav -o enhanced.wav

    # many files (taskfile) into an output directory
    python scripts/enhance_wav.py -c cfg.yaml -m ckpt.npz \\
        --taskfile noisy_list.txt -o out_dir/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from drnmf_tpu.dsp import wavwrite  # noqa: E402
from drnmf_tpu.dsp.wav import wavread_fs  # noqa: E402
from drnmf_tpu.enhance import enhance_signals  # noqa: E402
from drnmf_tpu.pipeline import drnmf_config_from_params  # noqa: E402
from drnmf_tpu.train import load_checkpoint  # noqa: E402
from drnmf_tpu.utils import load_yaml, StageTimer  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("wavs", nargs="*", help="input wav files")
    parser.add_argument("-c", "--config", required=True, help="model YAML")
    parser.add_argument("-m", "--model", required=True, help="checkpoint .npz")
    parser.add_argument("--taskfile", help="file listing input wavs")
    parser.add_argument("-o", "--out", required=True,
                        help="output wav (single input) or directory")
    parser.add_argument("--n-fft", type=int, default=512)
    parser.add_argument("--hop", type=int, default=128)
    parser.add_argument("--batch-size", type=int, default=128)
    args = parser.parse_args()

    inputs = list(args.wavs)
    if args.taskfile:
        with open(args.taskfile) as f:
            inputs += [line.strip() for line in f if line.strip()]
    if not inputs:
        parser.error("no input wavs (positional args or --taskfile)")
    if len(inputs) > 1 and not os.path.isdir(args.out):
        os.makedirs(args.out, exist_ok=True)

    cfg = load_yaml(args.config)
    f_bins = args.n_fft // 2 + 1
    # single source of truth for YAML -> architecture mapping: a missing key
    # here would silently run a different architecture than training did
    config = drnmf_config_from_params(cfg, f_bins)
    try:
        params, _ = load_checkpoint(args.model)
    except FileNotFoundError:
        parser.error(f"checkpoint not found: {args.model}")
    from drnmf_tpu.models.drnmf import ensure_fold_valid

    config = ensure_fold_valid(config, params)
    missing = [p for p in inputs if not os.path.isfile(p)]
    if missing:
        parser.error(f"input wav not found: {missing[0]}")

    timer = StageTimer()
    sigs, rates = [], []
    with timer.stage("read"):
        for path in inputs:
            x, fs = wavread_fs(path)
            sigs.append(x[0])
            rates.append(fs)
    audio_s = sum(len(s) for s in sigs) / rates[0]
    with timer.stage("enhance", audio_seconds=audio_s):
        outs = enhance_signals(params, config, sigs, args.n_fft, args.hop,
                               batch_size=args.batch_size)
    with timer.stage("write"):
        for path, fs, y in zip(inputs, rates, outs):
            if len(inputs) == 1 and not os.path.isdir(args.out):
                out_path = args.out
            else:
                out_path = os.path.join(args.out, os.path.basename(path))
            wavwrite(out_path, fs, y[None])
            print(f"{path} -> {out_path}")
    print(timer.report())


if __name__ == "__main__":
    main()
