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


def test_pallas_scan_block_t_padding(rng):
    """Multi-timestep grid blocks with T not divisible by block_t: padded
    steps carry mask 0 and are sliced off -- outputs equal the XLA scan."""
    from drnmf_tpu.ops.pallas import drnmf_scan_pallas
    from drnmf_tpu.models.drnmf import (
        _effective_matrices, _scan_hidden, step_mask_from_input,
    )
    import jax
    import jax.numpy as jnp

    f, r, T, B, K = 16, 4, 11, 2, 2  # T=11 pads to 12 at block_t=4
    cfg = DRNMFConfig(input_dim=f, r=r, output_dim=f, K_layers=K,
                      alph=10.0, lam1=0.3)
    params = init_drnmf_params(cfg, make_dict(rng, f, 2 * r))
    x = jnp.asarray(rng.uniform(0.0, 2.0, (B, T, f)).astype(np.float32))
    sm = step_mask_from_input(x, cfg.mask_value)
    ref = np.asarray(_scan_hidden(params, cfg, x, sm))

    U, S, W, b = _effective_matrices(params, cfg)
    h0 = jax.nn.softplus(params["log_h0"])
    h_init = jnp.broadcast_to(h0[None, :], (B, cfg.hidden_dim))
    for bt in (1, 4):
        out = drnmf_scan_pallas(
            x, sm, h_init, U[0], U[1], jnp.stack(S), jnp.stack(W),
            jnp.stack(b), interpret=True, block_t=bt,
        )
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_pallas_scan_bf16_weights_close_to_xla(rng):
    """bf16-resident weights: same recurrence within bf16 mantissa noise
    (the serving-precision configuration; halves the kernel's VMEM weight
    footprint so the flagship K=5/2r=2000 stack fits)."""
    f, r, T, B = 24, 4, 9, 2
    base = dict(input_dim=f, r=r, output_dim=f, K_layers=3,
                alph=10.0, lam1=0.3, params_untied=("log_D",),
                params_trainable=("log_D",))
    cfg_xla = DRNMFConfig(**base)
    cfg_pl = DRNMFConfig(**base, use_pallas=True, pallas_interpret=True,
                         pallas_weights_dtype="bfloat16")
    w = make_dict(rng, f, 2 * r)
    params = init_drnmf_params(cfg_xla, w)
    x = rng.uniform(0.0, 2.0, (B, T, f)).astype(np.float32)

    irm_xla = drnmf_apply(params, cfg_xla, x)
    irm_pl = drnmf_apply(params, cfg_pl, x)
    err = np.max(np.abs(np.asarray(irm_pl) - np.asarray(irm_xla)))
    assert err < 0.05, err  # bf16 weight rounding, not a wrong recurrence
    assert err > 0.0  # actually ran reduced precision


def test_vmem_feasibility_estimates():
    # small model fits
    assert pallas_scan_supported(2, 200, 257, 32)
    # flagship f32 K=5 2r=2000 does not fit the default budget
    assert not pallas_scan_supported(5, 2000, 257, 32)
    # ... but does in bf16
    assert pallas_scan_supported(5, 2000, 257, 32, dtype_bytes=2)


def test_snmf_mu_pallas_matches_xla_core(rng):
    """Fused Pallas ED MU optimization == the XLA while_loop core (beta=2),
    including objective history and W freezing."""
    import jax.numpy as jnp
    from drnmf_tpu.ops.snmf import _sparse_nmf_core
    from drnmf_tpu.ops.pallas.snmf_mu import sparse_nmf_ed_pallas

    m, r, n = 17, 6, 40
    v = rng.uniform(0.01, 1.0, (m, n)).astype(np.float32)
    w0 = rng.uniform(0.1, 1.0, (m, r)).astype(np.float32)
    h0 = rng.uniform(0.1, 1.0, (r, n)).astype(np.float32)
    w_mask = np.array([True] * 3 + [False] * 3)

    w_ref, h_ref, divs_ref, costs_ref, it_ref = _sparse_nmf_core(
        jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0),
        jnp.float32(0.7), jnp.asarray(w_mask), jnp.ones((r,), bool),
        beta=2.0, max_iter=8, conv_eps=0.0,
    )
    w_p, h_p, divs_p, costs_p, it_p = sparse_nmf_ed_pallas(
        v, w0, h0, 0.7, jnp.asarray(w_mask), max_iter=8, conv_eps=0.0,
        interpret=True, bf16=False,
    )
    assert int(it_p) == int(it_ref)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_ref),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_ref),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(costs_p), np.asarray(costs_ref),
                               rtol=2e-4)

    # the bf16-MXU default (the XLA core's effective precision class on
    # TPU, where DEFAULT matmul precision is single-pass bf16): same
    # optimization trajectory within bf16 input tolerance, monotone cost
    w_b, h_b, _, costs_b, it_b = sparse_nmf_ed_pallas(
        v, w0, h0, 0.7, jnp.asarray(w_mask), max_iter=8, conv_eps=0.0,
        interpret=True, bf16=True,
    )
    assert int(it_b) == int(it_ref)
    np.testing.assert_allclose(np.asarray(w_b), np.asarray(w_ref),
                               rtol=0.05, atol=5e-3)
    np.testing.assert_allclose(np.asarray(costs_b), np.asarray(costs_ref),
                               rtol=0.02)
    cb = np.asarray(costs_b)
    # bf16 input rounding perturbs the multiplicative updates, so strict
    # per-iteration monotonicity is NOT guaranteed (same property as the
    # XLA core at jax's default precision on TPU); the optimization must
    # still descend overall
    assert cb[-1] < cb[0]


def test_snmf_mu_pallas_conv_eps(rng):
    """Early stop fires identically."""
    import jax.numpy as jnp
    from drnmf_tpu.ops.snmf import _sparse_nmf_core
    from drnmf_tpu.ops.pallas.snmf_mu import sparse_nmf_ed_pallas

    m, r, n = 9, 4, 20
    v = rng.uniform(0.01, 1.0, (m, n)).astype(np.float32)
    w0 = rng.uniform(0.1, 1.0, (m, r)).astype(np.float32)
    h0 = rng.uniform(0.1, 1.0, (r, n)).astype(np.float32)
    _, _, _, _, it_ref = _sparse_nmf_core(
        jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0),
        jnp.float32(0.0), jnp.ones((r,), bool), jnp.ones((r,), bool),
        beta=2.0, max_iter=200, conv_eps=1e-3,
    )
    _, _, _, _, it_p = sparse_nmf_ed_pallas(
        v, w0, h0, 0.0, jnp.ones((r,), bool), max_iter=200, conv_eps=1e-3,
        interpret=True, bf16=False,
    )
    assert abs(int(it_p) - int(it_ref)) <= 1  # f32 cost roundoff at the stop


def test_snmf_use_pallas_routing(rng):
    """SNMFParams.use_pallas routes to the fused kernel with matching
    results (interpret-mode CPU check via monkeypatched default)."""
    import jax.numpy as jnp
    from drnmf_tpu.ops import SNMFParams
    from drnmf_tpu.ops.snmf import sparse_nmf
    from drnmf_tpu.ops.pallas import snmf_mu
    import unittest.mock as mock

    m, r, n = 11, 4, 30
    v = rng.uniform(0.01, 1.0, (m, n)).astype(np.float32)
    base = dict(r=r, cf="ed", sparsity=0.3, max_iter=5, conv_eps=0.0,
                random_seed=3)
    res_xla = sparse_nmf(v, SNMFParams(**base))
    orig = snmf_mu.sparse_nmf_ed_pallas
    with mock.patch.object(
        snmf_mu, "sparse_nmf_ed_pallas",
        lambda *a, **k: orig(*a, interpret=True, bf16=False, **k),
    ):
        res_p = sparse_nmf(v, SNMFParams(**base, use_pallas=True))
    np.testing.assert_allclose(res_p.w, res_xla.w, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(res_p.cost, res_xla.cost, rtol=2e-4)


def test_factored_pallas_scan_matches_xla(rng):
    """The factored+folded Pallas kernel (interpret mode) == the XLA
    factored fast path."""
    import jax
    import jax.numpy as jnp
    from drnmf_tpu.models import DRNMFConfig, init_drnmf_params
    from drnmf_tpu.models.drnmf import (
        _scan_hidden, _effective_matrices, step_mask_from_input)
    from drnmf_tpu.ops.pallas import drnmf_scan_pallas_factored

    f, r, K = 9, 8, 3
    w = rng.uniform(0.05, 1.0, (f, 2 * r)).astype(np.float32)
    w /= np.sqrt(np.sum(w**2, axis=0))
    cfg = DRNMFConfig(input_dim=f, r=r, output_dim=f, K_layers=K,
                      alph=10.0, lam1=0.5,
                      params_untied=("log_D", "log_alph"),
                      params_trainable=("log_D", "log_alph"))
    params = init_drnmf_params(cfg, w)
    x = jnp.asarray(rng.uniform(0, 1, (3, 11, f)).astype(np.float32))
    x = x.at[1, 7:].set(cfg.mask_value)
    sm = step_mask_from_input(x, cfg.mask_value)

    ref = np.asarray(_scan_hidden(params, cfg, x, sm))

    U, S, W, b = _effective_matrices(params, cfg, fold_u=True, factor_s=True)
    dkt = jnp.stack([s[0].T for s in S])
    dka = jnp.stack([W[0]] + [s[1] for s in S])
    h0 = jnp.broadcast_to(jax.nn.softplus(params["log_h0"])[None, :],
                          (3, 2 * r))
    out = np.asarray(drnmf_scan_pallas_factored(
        x, sm, h0, U.diag1, U.off1, U.c, dkt, dka, jnp.stack(b),
        interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_factored_pallas_interleaved_matches(rng):
    """The two-group interleaved factored kernel (DESIGN §7 MXU-overlap
    experiment) == the plain factored kernel."""
    import jax
    import jax.numpy as jnp
    from drnmf_tpu.models import DRNMFConfig, init_drnmf_params
    from drnmf_tpu.models.drnmf import (
        _effective_matrices, step_mask_from_input)
    from drnmf_tpu.ops.pallas import drnmf_scan_pallas_factored

    f, r, K = 9, 8, 3
    w = rng.uniform(0.05, 1.0, (f, 2 * r)).astype(np.float32)
    w /= np.sqrt(np.sum(w**2, axis=0))
    cfg = DRNMFConfig(input_dim=f, r=r, output_dim=f, K_layers=K,
                      alph=10.0, lam1=0.5,
                      params_untied=("log_D", "log_alph"),
                      params_trainable=("log_D", "log_alph"))
    params = init_drnmf_params(cfg, w)
    x = jnp.asarray(rng.uniform(0, 1, (4, 9, f)).astype(np.float32))
    x = x.at[2, 5:].set(cfg.mask_value)
    sm = step_mask_from_input(x, cfg.mask_value)

    U, S, W, b = _effective_matrices(params, cfg, fold_u=True, factor_s=True)
    dkt = jnp.stack([s[0].T for s in S])
    dka = jnp.stack([W[0]] + [s[1] for s in S])
    h0 = jnp.broadcast_to(jax.nn.softplus(params["log_h0"])[None, :],
                          (4, 2 * r))
    args = (x, sm, h0, U.diag1, U.off1, U.c, dkt, dka, jnp.stack(b))
    plain = np.asarray(drnmf_scan_pallas_factored(*args, interpret=True))
    inter = np.asarray(drnmf_scan_pallas_factored(*args, interpret=True,
                                                  interleave=True))
    np.testing.assert_allclose(inter, plain, rtol=1e-6, atol=1e-6)


def test_vmem_gate_falls_back_to_xla_scan(rng, monkeypatch):
    """use_pallas with a weight stack that fails the VMEM feasibility check
    must fall back to the XLA scan (identical outputs) instead of launching
    a kernel the Mosaic compiler would reject."""
    import drnmf_tpu.ops.pallas as plmod

    f, r, T, B = 24, 4, 9, 2
    base = dict(input_dim=f, r=r, output_dim=f, K_layers=2,
                alph=10.0, lam1=0.3)
    cfg_xla = DRNMFConfig(**base)
    cfg_pl = DRNMFConfig(**base, use_pallas=True)  # no interpret: real gate
    params = init_drnmf_params(cfg_xla, make_dict(rng, f, 2 * r))
    x = rng.uniform(0.0, 2.0, (B, T, f)).astype(np.float32)
    ref = np.asarray(drnmf_apply(params, cfg_xla, x))

    monkeypatch.setattr(plmod, "pallas_scan_supported",
                        lambda *a, **k: False)

    def _boom(*a, **k):
        raise AssertionError("pallas kernel launched despite failing the "
                             "VMEM gate")

    monkeypatch.setattr(plmod, "drnmf_scan_pallas", _boom)
    out = np.asarray(drnmf_apply(params, cfg_pl, x))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)
