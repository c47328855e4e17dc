"""Config system: YAML configs + md5-of-sorted-json artifact hashing.

Reproduces the reference's experiment registry (enhance.py:60-78, 679-714):
every artifact (dictionary, model, history, scores) is named by the md5 hash
of its sorted-JSON config, so reruns are idempotent and configs are
self-documenting.  Numpy scalars/arrays are JSON-encoded like the reference's
``MyEncoder``.
"""

import hashlib
import json
import os

import numpy as np
import yaml


class _NumpyEncoder(json.JSONEncoder):
    def default(self, obj):
        if isinstance(obj, np.integer):
            return int(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        return super().default(obj)


def config_hash(config: dict, exclude=()) -> str:
    cfg = {k: v for k, v in config.items() if k not in exclude}
    return hashlib.md5(
        json.dumps(cfg, sort_keys=True, cls=_NumpyEncoder).encode()
    ).hexdigest()


def load_yaml(path):
    with open(path) as f:
        return yaml.safe_load(f.read())


def dump_yaml(obj, path):
    with open(path, "w") as f:
        yaml.safe_dump(obj, f)


def ensure_experiment_dirs(folder_exp):
    """Create the experiment folder layout (enhance.py:709-713)."""
    for sub in ("configs", "history", "models", "scores"):
        os.makedirs(os.path.join(folder_exp, sub), exist_ok=True)
    return folder_exp
