"""Two-stage SNMF dictionary training recipe.

Behavioral port of the reference's ``train_snmf`` (enhance.py:81-135):

1. train SNMF on *clean* magnitude frames -> speech dictionary W_clean
   (r atoms, unit-L2 columns);
2. train SNMF on *noisy* frames with ``init_w = [W_clean, rand]`` and
   ``w_update_ind = [0...0, 1...1]`` so only the noise half updates;
3. both stages cached by md5(params) (enhance.py:74-78).

Returns the concatenated dictionary W_noisy = [W_clean, W_noise].
"""

from dataclasses import replace

import jax
import numpy as np

from ..ops.snmf import SNMFParams, sparse_nmf_chunked
from ..utils.cache import snmf_cache_path, save_snmf, load_snmf
import os


def train_snmf(clean_frames, noisy_frames, params_snmf: SNMFParams,
               path_dicts="./", save_h=False, flag_recompute=False,
               verbose=True, frame_chunk=None):
    r = int(params_snmf.r)

    # stage 1: clean-speech dictionary
    clean_path = snmf_cache_path(params_snmf, path_dicts, prefix="clean")
    if os.path.exists(clean_path) and not flag_recompute:
        if verbose:
            print(f"Loading cached clean SNMF dictionary {clean_path}")
        w_clean, _, _ = load_snmf(clean_path, load_h=False)
    else:
        if verbose:
            print(f"Training SNMF (sparsity {float(np.ravel(params_snmf.sparsity)[0]):.3f}) on clean frames...")
        res = sparse_nmf_chunked(
            clean_frames, params_snmf, frame_chunk=frame_chunk,
            save_h=save_h, verbose=verbose,
        )
        w_clean = res.w
        save_snmf(clean_path, res.w, res.h, {"div": res.div, "cost": res.cost},
                  save_h=save_h)

    # stage 2: noisy dictionary with frozen speech half
    noisy_path = snmf_cache_path(params_snmf, path_dicts, prefix="noisy")
    if os.path.exists(noisy_path) and not flag_recompute:
        if verbose:
            print(f"Loading cached noisy SNMF dictionary {noisy_path}")
        w_noisy, h_noisy, obj = load_snmf(noisy_path, load_h=save_h)
        return w_noisy, h_noisy, obj

    if verbose:
        print("Training SNMF on noisy frames (speech half frozen)...")
    key = jax.random.PRNGKey(int(params_snmf.random_seed) + 1)
    w_init = np.concatenate(
        [w_clean, np.asarray(jax.random.uniform(key, w_clean.shape), np.float32)],
        axis=1,
    )
    idx_update = np.concatenate([np.zeros(r, bool), np.ones(r, bool)])
    params_noisy = replace(
        params_snmf, r=2 * r, init_w=w_init, w_update_ind=idx_update
    )
    res = sparse_nmf_chunked(
        noisy_frames, params_noisy, frame_chunk=frame_chunk,
        save_h=save_h, verbose=verbose,
    )
    obj = {"div": res.div, "cost": res.cost}
    save_snmf(noisy_path, res.w, res.h, obj, save_h=save_h)
    return res.w, res.h, obj
