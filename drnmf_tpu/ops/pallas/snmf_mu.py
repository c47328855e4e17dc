"""Fused Pallas MU iteration for sparse NMF under the ED (beta=2) objective.

The XLA version (ops/snmf.py::_sparse_nmf_core) materializes ``lam = W @ H``
in HBM several times per iteration; at the reference's dictionary scale
(r=2000 atoms, 140k frames) H is 1.1 GB and the iteration is HBM-bound at
~47 TFLOPS effective.  This kernel restructures one MU iteration into two
streaming passes over the frame axis with ``lam`` living only in VMEM:

* **pass 1** (per frame tile): ``lam = max(W h, flr)`` -> H update
  ``h *= (W^T v) / max(W^T lam + sp, flr)`` -> write h' -> ``lam' = max(W
  h', flr)`` -> accumulate the additive W-update statistics ``A += v h'^T``,
  ``B += lam' h'^T`` and the sparsity penalty ``sp_sum += sum(sp * h')`` in
  VMEM across the grid.  HBM traffic: read v + h, write h' (the statistics
  are (m, r) and stay on-chip).
* the (m, r) normalization-aware W update + column renorm runs in plain XLA
  (trivially small), exactly as sparse_nmf_gpu.m:232-264.
* **pass 2** (per frame tile): ``div += sum((v - max(W_new h', flr))^2)`` --
  the objective evaluated AFTER the W update, matching the reference's
  iteration ordering (sparse_nmf_gpu.m:267-298).

Semantics match ``_sparse_nmf_core`` for beta=2 with all-True
``h_update_ind`` (the configuration every reference recipe uses: H is always
updated; W freezing is handled in the XLA update step via ``w_mask``).
Frames are zero-padded to the tile size; padded columns contribute h'=0 and
a divergence bias of ``m * pad * flr**2`` (~1e-13, below f32 resolution of
the objective).

STATUS — TRACK CLOSED (round 5).  Measured on v5e, r=2000/F=257/140k
frames: round-4 f32 kernel 38.8 iters/s vs the XLA core's 60.2; the
round-5 bf16-MXU variant (this file, ``bf16=True`` default: cast matmul
inputs to bf16 so each product is a single MXU pass, matching XLA's
DEFAULT-precision class) measured **17.2 iters/s at TN=128** — slower
than its own f32 predecessor — and the TN=256 sweep failed to compile on
the axon toolchain (AOT PJRT internal error).  Post-mortem: the kernel's
per-tile chain of six *dependent* small matmuls ((257,2000)x(2000,128))
is MXU-LATENCY-bound, not precision-bound, so halving per-pass cost
cannot help — the dependent chain just waits on shorter passes while the
bf16 casts add VPU work and the f32<->bf16 copies add VMEM traffic.  The
16 MB VMEM budget caps the frame tile at 128 (W + A/B scratch are ~6 MB
resident; TN=512 via raised vmem_limit spills to HBM, 2.5x slower), and
at that tile there is nothing left to overlap WITHIN the kernel, whereas
XLA's global schedule overlaps the same products across the whole
140k-frame axis.  A fused one-kernel MU update cannot beat the compiler
here at any tile size this hardware admits; the XLA core is and stays
the production path.  Kept as a parity-tested experimental path
(``SNMFParams.use_pallas``, ``DRNMF_PALLAS_MU_TN``).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FLR = 1e-9
_TN = 128  # frames per tile: the 16 MB VMEM budget (W + A/B scratch are
# ~6 MB resident).  Measured: raising vmem_limit_bytes to allow TN=512
# spills to HBM and is 2.5x slower still -- v5e scoped VMEM is the real cap.
_VMEM_LIMIT = 16 * 1024 * 1024

# bf16 MXU inputs (f32 accumulation) for the kernel's matmuls.  The XLA
# core this kernel competes with runs at jax's DEFAULT matmul precision --
# single-pass bf16 MXU inputs -- while an explicit f32 Pallas dot pays the
# multi-pass f32 decomposition: the round-4 kernel was comparing ~6-pass
# matmuls against 1-pass ones.  True = match the XLA core's effective
# precision (and its numerics class); False = the round-4 exact-f32 path.
_MXU_BF16_DEFAULT = True


def _mxu(x, bf16):
    return x.astype(jnp.bfloat16) if bf16 else x


def _dot(a, b, bf16):
    return jnp.dot(_mxu(a, bf16), _mxu(b, bf16),
                   preferred_element_type=jnp.float32)


def _dotT_lhs(a, b, bf16):
    """a^T @ b without materializing the transpose (MXU-native form)."""
    return jax.lax.dot_general(
        _mxu(a, bf16), _mxu(b, bf16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dotT_rhs(a, b, bf16):
    """a @ b^T without materializing the transpose."""
    return jax.lax.dot_general(
        _mxu(a, bf16), _mxu(b, bf16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pass1_kernel(v_ref, h_ref, w_ref, hout_ref, a_ref, b_ref, sps_ref,
                  a_scr, b_scr, sp_scr, *, sparsity, bf16):
    i = pl.program_id(0)
    w = w_ref[:]
    h = h_ref[:]
    lam = jnp.maximum(_dot(w, h, bf16), _FLR)
    numer = _dotT_lhs(w, v_ref[:], bf16)
    denom = _dotT_lhs(w, lam, bf16) + sparsity
    h_new = h * numer / jnp.maximum(denom, _FLR)
    hout_ref[:] = h_new
    lam2 = jnp.maximum(_dot(w, h_new, bf16), _FLR)
    a_c = _dotT_rhs(v_ref[:], h_new, bf16)
    b_c = _dotT_rhs(lam2, h_new, bf16)
    sp_c = jnp.float32(sparsity) * jnp.sum(h_new)

    # accumulate in persistent VMEM scratch; flush to the (revisited) output
    # blocks only on the last grid step -- avoids a 4 MB HBM writeback of the
    # statistics on every tile
    @pl.when(i == 0)
    def _init():
        a_scr[:] = a_c
        b_scr[:] = b_c
        sp_scr[0] = sp_c

    @pl.when(i > 0)
    def _acc():
        a_scr[:] += a_c
        b_scr[:] += b_c
        sp_scr[0] += sp_c

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        a_ref[:] = a_scr[:]
        b_ref[:] = b_scr[:]
        sps_ref[0, 0] = sp_scr[0]


def _pass2_kernel(v_ref, h_ref, w_ref, div_ref, d_scr, *, bf16):
    i = pl.program_id(0)
    lam = jnp.maximum(_dot(w_ref[:], h_ref[:], bf16), _FLR)
    d = jnp.sum((v_ref[:] - lam) ** 2)

    @pl.when(i == 0)
    def _init():
        d_scr[0] = d

    @pl.when(i > 0)
    def _acc():
        d_scr[0] += d

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        div_ref[0, 0] = d_scr[0]


def _mu_ed_iteration(v, h, w, sparsity, w_mask, interpret=False,
                     bf16=None, tile_n=None):
    """One full MU iteration (H update, W update, objective).

    v: (m, n), h: (r, n), w: (m, r); n must be a multiple of the tile.
    ``bf16``: bf16 MXU inputs / f32 accumulation (default
    _MXU_BF16_DEFAULT -- the XLA core's effective precision class).
    ``tile_n``: frames per tile (default _TN; env DRNMF_PALLAS_MU_TN).
    Returns (h', w', div, cost)."""
    import os as _os

    if bf16 is None:
        bf16 = bool(int(_os.environ.get("DRNMF_PALLAS_MU_BF16",
                                        str(int(_MXU_BF16_DEFAULT)))))
    _tn = tile_n or int(_os.environ.get("DRNMF_PALLAS_MU_TN", str(_TN)))
    m, n = v.shape
    r = h.shape[0]
    grid = (n // _tn,)

    tile_v = pl.BlockSpec((m, _tn), lambda i: (0, i), memory_space=pltpu.VMEM)
    tile_h = pl.BlockSpec((r, _tn), lambda i: (0, i), memory_space=pltpu.VMEM)
    whole = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    h_new, a, b, sp_sum = pl.pallas_call(
        partial(_pass1_kernel, sparsity=float(sparsity), bf16=bf16),
        grid=grid,
        in_specs=[tile_v, tile_h, whole((m, r))],
        out_specs=[
            tile_h,
            whole((m, r)),
            whole((m, r)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, n), jnp.float32),
            jax.ShapeDtypeStruct((m, r), jnp.float32),
            jax.ShapeDtypeStruct((m, r), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((m, r), jnp.float32),
            pltpu.VMEM((m, r), jnp.float32),
            pltpu.SMEM((1,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(v, h, w)

    # normalization-aware W update + renorm (sparse_nmf_gpu.m:232-264) --
    # (m, r) tensors, plain XLA
    dpw = b + jnp.sum(a * w, axis=0)[None, :] * w
    dmw = a + jnp.sum(b * w, axis=0)[None, :] * w
    w_new = w * dmw / jnp.maximum(dpw, _FLR)
    w_new = jnp.where(w_mask[None, :], w_new, w)
    w_new = w_new / jnp.sqrt(jnp.sum(w_new * w_new, axis=0, keepdims=True))

    div = pl.pallas_call(
        partial(_pass2_kernel, bf16=bf16),
        grid=grid,
        in_specs=[tile_v, tile_h, whole((m, r))],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(v, h_new, w_new)[0, 0]

    cost = div + sp_sum[0, 0]
    return h_new, w_new, div, cost


def sparse_nmf_ed_pallas(v, w0, h0, sparsity, w_mask, max_iter, conv_eps,
                         interpret=False, bf16=None, tile_n=None):
    """Full ED sparse NMF optimization with the fused MU kernel.

    Mirrors ``_sparse_nmf_core`` for beta=2 / all-True h_update_ind:
    W-column pre-normalization with H rescale, per-iteration objective
    history, conv_eps relative-cost early stop.  Returns
    (w, h, divs, costs, n_iter)."""
    v = jnp.asarray(v, jnp.float32)
    w0 = jnp.asarray(w0, jnp.float32)
    h0 = jnp.asarray(h0, jnp.float32)
    m, n = v.shape
    r = h0.shape[0]

    import os as _os

    _tn = tile_n or int(_os.environ.get("DRNMF_PALLAS_MU_TN", str(_TN)))
    pad = (-n) % _tn
    if pad:
        v = jnp.pad(v, ((0, 0), (0, pad)))
        h0 = jnp.pad(h0, ((0, 0), (0, pad)))

    wn = jnp.sqrt(jnp.sum(w0 * w0, axis=0))
    w0 = w0 / wn[None, :]
    h0 = h0 * wn[:, None]

    def body(carry):
        w, h, last_cost, it, divs, costs, done = carry
        h, w, div, cost = _mu_ed_iteration(
            v, h, w, sparsity, w_mask, interpret=interpret, bf16=bf16,
            tile_n=_tn,
        )
        divs = divs.at[it].set(div)
        costs = costs.at[it].set(cost)
        converged = jnp.logical_and(
            it > 0,
            jnp.logical_and(
                conv_eps > 0, jnp.abs(cost - last_cost) / last_cost < conv_eps
            ),
        )
        return (w, h, cost, it + 1, divs, costs, converged)

    def cond(carry):
        _, _, _, it, _, _, done = carry
        return jnp.logical_and(it < max_iter, jnp.logical_not(done))

    init = (
        w0, h0, jnp.float32(np.inf), jnp.int32(0),
        jnp.zeros((max_iter,), jnp.float32),
        jnp.zeros((max_iter,), jnp.float32),
        jnp.bool_(False),
    )
    w, h, _, n_iter, divs, costs, _ = jax.lax.while_loop(cond, body, init)
    if pad:
        h = h[:, :n]
    return w, h, divs, costs, n_iter
