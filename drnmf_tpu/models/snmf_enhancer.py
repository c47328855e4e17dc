"""SNMF-only enhancement path (no learned unfolding).

Reimplements the reference's 'snmf' model branch (enhance.py:750-928):
inference = multiplicative updates with W frozen (w_update_ind all-False,
max_iter=200, conv_eps=0), then the Wiener-style ratio mask
``irm = W_c H_c / (1e-9 + W_c H_c + W_n H_n)`` (enhance.py:847-852).
"""

from dataclasses import replace

import numpy as np

from ..ops.snmf import SNMFParams, sparse_nmf_chunked


def snmf_infer_irm(x_frames: np.ndarray, w_noisy: np.ndarray,
                   params_snmf: SNMFParams, max_iter: int = 200,
                   frame_chunk=None, key=None):
    """Infer activations for noisy frames under a frozen dictionary and
    compute the ratio mask.

    x_frames: (F, n_frames) nonnegative magnitudes.
    w_noisy:  (F, 2r) = [W_clean, W_noise].
    Returns (irm (F, n_frames), h (2r, n_frames)).
    """
    r2 = w_noisy.shape[1]
    r = r2 // 2
    infer_params = replace(
        params_snmf,
        r=r2,
        init_w=np.asarray(w_noisy, np.float32),
        w_update_ind=np.zeros(r2, bool),
        conv_eps=0.0,
        max_iter=max_iter,
    )
    res = sparse_nmf_chunked(x_frames, infer_params, frame_chunk=frame_chunk, key=key)
    h = res.h
    w_clean, w_noise = w_noisy[:, :r], w_noisy[:, r:]
    clean_est = w_clean @ h[:r]
    noise_est = w_noise @ h[r:]
    irm = clean_est / (1e-9 + clean_est + noise_est)
    return irm.astype(np.float32), h
