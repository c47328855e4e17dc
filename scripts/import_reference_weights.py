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

    out = args.out or os.path.splitext(args.h5file)[0] + ".npz"
    save_checkpoint(out, params)
    print(f"{args.h5file} -> {out} ({len(params)} tensors)")


if __name__ == "__main__":
    main()
