#!/usr/bin/env python
"""Standalone rescoring: score enhanced-vs-reference wav lists per SNR.

Equivalent of the reference's score_audio.sh:1-32 + score_audio.m entry
point, without the MATLAB subprocess: all metrics (BSS-Eval SDR, SNR,
SegSNR local/global, PESQ, STOI) run on-device via drnmf_tpu.metrics.

Two modes:

  # explicit taskfiles (score_audio.m signature)
  python scripts/score_audio.py --enh taskfile_enh.txt --ref taskfile_ref.txt \\
      --savefile scores.npz [--no-pesq]

  # rescore a description's enhanced outputs per SNR bucket (score_audio.sh)
  python scripts/score_audio.py --desc unfolded_snmf_<hash>_valid \\
      --ref taskfile_chime2_valid_clean.txt [--no-pesq]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drnmf_tpu.metrics.scoring import score_taskfiles, SCORE_LABELS  # noqa: E402

SNRS = ["m6dB", "m3dB", "0dB", "3dB", "6dB", "9dB"]


def read_list(path):
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--enh", help="taskfile of enhanced wavs")
    parser.add_argument("--ref", required=True, help="taskfile of reference wavs")
    parser.add_argument("--desc", help="description: rescore "
                        "'scaled'->'enhanced_<desc>' substitutions per SNR")
    parser.add_argument("--savefile", default=None)
    parser.add_argument("--pesq", action="store_true",
                        help=argparse.SUPPRESS)  # PESQ is on by default now
    parser.add_argument("--no-pesq", action="store_true",
                        help="skip PESQ (on by default, like the reference "
                        "score_audio.m:225)")
    parser.add_argument("--rescore", action="store_true",
                        help="ignore cached score files")
    parser.add_argument("--no-align", action="store_true",
                        help="skip the P.862-style time alignment "
                        "(unbounded + per-utterance delay compensation, on "
                        "by default).  The reference aligned only inside "
                        "PESQ (score_audio.m:225 via pesq_16kHz); applying "
                        "the same alignment to all six metrics is this "
                        "framework's extension.  With --no-align the "
                        "constant-delay detection guard still applies.")
    args = parser.parse_args()
    align = "guard" if args.no_align else "full"

    refs = read_list(args.ref)

    if args.desc:
        for snr in SNRS:
            refs_snr = [w for w in refs if f"/{snr}/" in w]
            if not refs_snr:
                continue
            enh_snr = [w.replace("scaled", f"enhanced_{args.desc}")
                       for w in refs_snr]
            missing = [w for w in enh_snr if not os.path.isfile(w)]
            if missing:
                parser.error(
                    f"{len(missing)} enhanced file(s) for description "
                    f"'{args.desc}' not found, e.g. {missing[0]}"
                )
            if args.savefile:
                base, ext = os.path.splitext(args.savefile)
                savefile = f"{base}_{snr}{ext or '.npz'}"
            else:
                savefile = f"scores_{args.desc}_{snr}.npz"
            print(f"Scoring SNR {snr} ({len(refs_snr)} files) -> {savefile}")
            S, _ = score_taskfiles(
                enh_snr, refs_snr, savefile=savefile,
                compute_pesq=not args.no_pesq, flag_rescore=args.rescore,
                align=align,
            )
            for label, val in zip(SCORE_LABELS, S.mean(axis=0)):
                print(f"  mean {label}: {val:.3f}")
        return

    if not args.enh:
        parser.error("either --enh or --desc is required")
    enh = read_list(args.enh)
    if len(enh) != len(refs):
        parser.error(f"list length mismatch: {len(enh)} enhanced vs "
                     f"{len(refs)} reference files")
    S, _ = score_taskfiles(
        enh, refs, savefile=args.savefile, compute_pesq=not args.no_pesq,
        flag_rescore=args.rescore, align=align,
    )
    for label, val in zip(SCORE_LABELS, S.mean(axis=0)):
        print(f"mean {label}: {val:.3f}")


if __name__ == "__main__":
    main()
