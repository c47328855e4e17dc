"""Model checkpointing.

Equivalent of the reference's Keras ``ModelCheckpoint(save_best_only=True,
save_weights_only=True)`` HDF5 files (enhance.py:1135).  Parameters are flat
dicts of arrays, stored as ``.npz`` with the key set preserved; a best-only
policy lives in the training loop.
"""

import os

import numpy as np


def save_checkpoint(path, params, meta=None):
    arrays = {k: np.asarray(v) for k, v in params.items()}
    if meta:
        for k, v in meta.items():
            arrays[f"__meta_{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)


def load_checkpoint(path):
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    params = {k: data[k] for k in data.files if not k.startswith("__meta_")}
    meta = {
        k[len("__meta_"):]: data[k] for k in data.files if k.startswith("__meta_")
    }
    return params, meta
