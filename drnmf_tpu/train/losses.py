"""Training losses.

Reference semantics (enhance.py:1040-1073 + Keras 2.0.4 weighted objectives):

* 'mse_of_masked' signal approximation: the model output is redefined as
  ``x * predicted_mask`` and the objective is MSE against the clean magnitude
  ``y``, with the binary frame-validity mask as *temporal sample weights*.
  Keras's weighted objective reduces to a masked mean:
  ``sum_t mask_t * mean_F((x_t * irm_t - y_t)^2) / sum_t mask_t``.

* SNMF-cost pretraining (enhance.py:1024-1036): outputs are
  ``x_recon = clean_est + noise_est`` and the code ``h``; losses
  ``[0.5 * mse(x_recon, x), lam1 * 2r/F * mean_{2r}(|h|)]`` with the same
  temporal weighting -- the unfolded network's own sparse-coding objective.
"""

import jax.numpy as jnp


def masked_mse_signal_approx(irm, x, y, mask):
    """irm, x, y: (B, T, F); mask: (B, T) or (B, T, 1) binary."""
    if mask.ndim == 3:
        mask = mask[..., 0]
    per_step = jnp.mean((x * irm - y) ** 2, axis=-1)  # (B, T)
    return jnp.sum(per_step * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def snmf_pretrain_loss(clean_est, noise_est, hidden, x, mask, lam1):
    """0.5*masked-MSE(x_recon, x) + lam1*(2r/F)*masked-mean(mean|h|)."""
    if mask.ndim == 3:
        mask = mask[..., 0]
    x_recon = clean_est + noise_est
    mse_step = jnp.mean((x_recon - x) ** 2, axis=-1)
    l1_step = jnp.mean(jnp.abs(hidden), axis=-1)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    n2r = hidden.shape[-1]
    f = x.shape[-1]
    weight = lam1 * jnp.float32(n2r) / jnp.float32(f)
    return (
        0.5 * jnp.sum(mse_step * mask) / denom
        + weight * jnp.sum(l1_step * mask) / denom
    )
