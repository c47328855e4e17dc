"""Pallas kernel tests (interpreter mode on CPU; real compilation is
exercised on TPU by bench.py)."""

import numpy as np
import pytest

from drnmf_tpu.models import DRNMFConfig, init_drnmf_params, drnmf_apply
from drnmf_tpu.ops.pallas import pallas_scan_supported


def make_dict(rng, f, r2):
    w = rng.uniform(0.05, 1.0, (f, r2)).astype(np.float32)
    return w / np.sqrt(np.sum(w**2, axis=0))


@pytest.mark.parametrize("K", [1, 2, 3])
def test_pallas_scan_matches_xla_scan(rng, K):
    f, r, T, B = 24, 4, 9, 2
    base = dict(input_dim=f, r=r, output_dim=f, K_layers=K,
                alph=10.0, lam1=0.3, params_untied=("log_D",),
                params_trainable=("log_D",))
    cfg_xla = DRNMFConfig(**base)
    cfg_pl = DRNMFConfig(**base, use_pallas=True, pallas_interpret=True)
    w = make_dict(rng, f, 2 * r)
    params = init_drnmf_params(cfg_xla, w)
    x = rng.uniform(0.0, 2.0, (B, T, f)).astype(np.float32)
    x[0, 6:] = -1.0  # masked tail

    irm_xla, hid_xla, _, _ = drnmf_apply(params, cfg_xla, x, return_parts=True)
    irm_pl, hid_pl, _, _ = drnmf_apply(params, cfg_pl, x, return_parts=True)
    np.testing.assert_allclose(np.asarray(hid_pl), np.asarray(hid_xla),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(irm_pl), np.asarray(irm_xla),
                               rtol=1e-4, atol=1e-5)


def test_vmem_feasibility_estimates():
    # small model fits
    assert pallas_scan_supported(2, 200, 257, 32)
    # flagship f32 K=5 2r=2000 does not fit the default budget
    assert not pallas_scan_supported(5, 2000, 257, 32)
    # ... but does in bf16
    assert pallas_scan_supported(5, 2000, 257, 32, dtype_bytes=2)
