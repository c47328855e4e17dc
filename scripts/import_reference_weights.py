#!/usr/bin/env python
"""Convert a reference Keras checkpoint to a drnmf-tpu npz checkpoint.

Migration path for users of the reference: take the HDF5 weights its
ModelCheckpoint wrote (models/model_<type>_<hash>.hdf5) and produce a
checkpoint this framework's pipeline and tools load directly.  Model family
is inferred from the filename substring like the reference driver
('unfolded_snmf' before 'snmf' before 'lstm').

Usage:
    python scripts/import_reference_weights.py model_unfolded_snmf_<hash>.hdf5 \\
        [-o model_unfolded_snmf_<hash>.npz]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drnmf_tpu.train import save_checkpoint  # noqa: E402
from drnmf_tpu.utils.convert import (  # noqa: E402
    import_drnmf_keras_weights,
    import_lstm_keras_weights,
)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("h5file", help="reference Keras HDF5 weights")
    parser.add_argument("-o", "--out", default=None,
                        help="output .npz (default: same name, .npz)")
    parser.add_argument("-c", "--config", default=None,
                        help="model YAML of the reference run; if given, "
                        "imported shapes are validated against it "
                        "(catches transposed/mismatched layouts)")
    parser.add_argument("--n-fft", type=int, default=512)
    args = parser.parse_args()

    if not os.path.isfile(args.h5file):
        parser.error(f"file not found: {args.h5file}")
    name = os.path.basename(args.h5file)
    if "unfolded_snmf" in name:
        params = import_drnmf_keras_weights(args.h5file)
    elif "lstm" in name:
        params = import_lstm_keras_weights(args.h5file)
    else:
        parser.error(
            f"cannot infer model type from filename '{name}' "
            "(expected an 'unfolded_snmf' or 'lstm' substring)"
        )

    if args.config:
        from drnmf_tpu.utils import load_yaml
        from drnmf_tpu.utils.convert import (
            validate_drnmf_import, validate_lstm_import)

        cfg = load_yaml(args.config)
        f_bins = args.n_fft // 2 + 1
        if "unfolded_snmf" in name:
            from drnmf_tpu.pipeline import drnmf_config_from_params

            validate_drnmf_import(
                params, drnmf_config_from_params(cfg, f_bins))
        else:
            from drnmf_tpu.models import LSTMConfig

            validate_lstm_import(params, LSTMConfig(
                input_dim=f_bins, hidden_dim=int(cfg["hidden_dim"]),
                output_dim=f_bins, K_layers=int(cfg["K_layers"])))
        print("shape validation against config: OK")

    out = args.out or os.path.splitext(args.h5file)[0] + ".npz"
    save_checkpoint(out, params)
    print(f"{args.h5file} -> {out} ({len(params)} tensors)")


if __name__ == "__main__":
    main()
