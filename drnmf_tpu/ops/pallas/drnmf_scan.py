"""Fused Pallas kernel for the DR-NMF time recurrence.

Motivation: the recurrence's cost is dominated by reading the (2r, 2r)
recurrence matrices every timestep.  Under a plain ``lax.scan`` XLA re-reads
U/S/W from HBM each step (or relies on fitting them in VMEM heuristically);
this kernel makes the residency explicit: the grid iterates over timesteps,
every weight BlockSpec has a *constant* index map (so Pallas fetches each
weight exactly once and keeps it in VMEM for the whole scan), and only the
(B, F) input frame and the (B, 2r) output stream per step.  The carried
hidden state lives in a VMEM scratch buffer across grid steps (TPU grid
iterations execute sequentially, which makes the carry legal).

Semantics are identical to ``models.drnmf._scan_hidden``: per timestep a
K-layer stack

    hidden_k = relu(h_prev @ U_k + hidden_{k-1} @ S_{k-1} + x_t @ W_k + b_k)

with masked steps holding the carry.  U_1 and U_{k>1} are passed as two
matrices (the reference ties all k>1 recurrences to one ``log_Uk``,
enhance.py:162-167).

VMEM budget (flagship K=5, 2r=2000, f32): U 2x16 MB + S 4x16 MB + W 5x2 MB
~= 106 MB -- inside a v5e's ~128 MB VMEM but tight; callers can pass
bfloat16 weights to halve it.  ``pallas_scan_supported`` estimates the
budget and the model falls back to the XLA scan when it does not fit.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot(a, w):
    """Activation x weight matmul; bf16-resident weights get bf16 lhs too
    (the MXU's native input width -- identical numerics to XLA's default
    f32-matmul lowering, which also feeds the MXU bf16 passes) with f32
    accumulation."""
    if w.dtype != jnp.float32:
        a = a.astype(w.dtype)
    return jnp.dot(a, w, preferred_element_type=jnp.float32)


def _kernel(x_ref, m_ref, h0_ref, u1_ref, uk_ref, s_ref, w_ref, b_ref,
            out_ref, h_carry, *, k_layers, block_t):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_carry[:] = h0_ref[:]

    # block_t timesteps per grid step: the recurrence stays sequential, but
    # grid/DMA bookkeeping amortizes over the block
    h_prev = h_carry[:]
    for c in range(block_t):
        x_t = x_ref[c]
        hidden = None
        for k in range(k_layers):
            u = u1_ref[:] if k == 0 else uk_ref[:]
            pre = _dot(h_prev, u)
            if k > 0:
                pre = pre + _dot(hidden, s_ref[k - 1])
            pre = pre + _dot(x_t, w_ref[k])
            hidden = jnp.maximum(pre + b_ref[k][None, :], 0.0)
        m_t = m_ref[c]  # (B, 1)
        h_prev = jnp.where(m_t > 0, hidden, h_prev)
        out_ref[c] = h_prev
    h_carry[:] = h_prev


def drnmf_scan_pallas(x, step_mask, h0, u1, uk, s_stack, w_stack, b_stack,
                      interpret: bool = False,
                      vmem_limit_bytes: int | None = None,
                      block_t: int = 2):
    """Run the recurrence.

    x: (B, T, F); step_mask: (B, T) bool; h0: (B, 2r);
    u1, uk: (2r, 2r); s_stack: (K-1, 2r, 2r) (dummy (1, ...) when K == 1);
    w_stack: (K, F, 2r); b_stack: (K, 2r).
    Returns hidden states (B, T, 2r) float32.

    ``vmem_limit_bytes``: raise the kernel's scoped-VMEM budget when the
    weight stack exceeds the platform default (the flagship K=5/2r=2000
    stack is ~56 MB in bf16 -- auto-raised to fit when None).
    """
    bsz, t_len, f = x.shape
    n2r = h0.shape[-1]
    k_layers = w_stack.shape[0]

    if vmem_limit_bytes is None:
        def pad128(n):
            return -(-n // 128) * 128

        wbytes = u1.dtype.itemsize
        weights = (
            (2 + max(1, k_layers - 1)) * pad128(n2r) * pad128(n2r) * wbytes
            + k_layers * pad128(f) * pad128(n2r) * wbytes
            + k_layers * pad128(n2r) * 4
        )
        act = (
            2 * block_t * bsz * (pad128(f) + pad128(n2r))  # x/out, 2x buffered
            + 4 * bsz * pad128(n2r)  # carry, h0, layer temps
        ) * 4
        vmem_limit_bytes = min(int((weights + act) * 1.25), 126 * 1024 * 1024)

    xT = jnp.swapaxes(x, 0, 1)  # (T, B, F)
    mT = jnp.swapaxes(step_mask, 0, 1)[..., None].astype(jnp.float32)  # (T, B, 1)

    block_t = max(1, min(block_t, t_len))
    pad_t = (-t_len) % block_t
    if pad_t:
        # padded steps carry mask 0: they hold the state and their outputs
        # are sliced off below
        xT = jnp.pad(xT, ((0, pad_t), (0, 0), (0, 0)))
        mT = jnp.pad(mT, ((0, pad_t), (0, 0), (0, 0)))
    t_pad = t_len + pad_t

    grid = (t_pad // block_t,)
    const = lambda t: (0, 0)
    const3 = lambda t: (0, 0, 0)

    out = pl.pallas_call(
        partial(_kernel, k_layers=k_layers, block_t=block_t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_t, bsz, f), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bsz, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, n2r), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n2r, n2r), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n2r, n2r), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(s_stack.shape, const3, memory_space=pltpu.VMEM),
            pl.BlockSpec(w_stack.shape, const3, memory_space=pltpu.VMEM),
            pl.BlockSpec(b_stack.shape, const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, bsz, n2r), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, bsz, n2r), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bsz, n2r), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
    )(xT, mT, h0, u1, uk, s_stack, w_stack, b_stack)
    return jnp.swapaxes(out[:t_len], 0, 1)


def pallas_scan_supported(k_layers: int, n2r: int, f: int, bsz: int,
                          dtype_bytes: int = 4,
                          vmem_budget: int = 100 * 1024 * 1024) -> bool:
    """Rough VMEM feasibility check for the fused scan."""
    def pad128(n):
        return -(-n // 128) * 128

    weights = (
        2 * pad128(n2r) * pad128(n2r)  # U1, Uk
        + max(1, k_layers - 1) * pad128(n2r) * pad128(n2r)  # S stack
        + k_layers * pad128(f) * pad128(n2r)  # W stack
        + k_layers * pad128(n2r)
    ) * dtype_bytes
    act = (3 * bsz * pad128(n2r) + 2 * bsz * pad128(f)) * 4 * 2  # double buffer
    return weights + act < vmem_budget


def _kernel_factored(x_ref, m_ref, h0_ref, fold_ref, dkt_ref, dka_ref,
                     b_ref, out_ref, h_carry, *, k_layers, block_t):
    """Factored + folded step (models.drnmf.layer_pre semantics):

        rs      = rowsum(h_prev)
        u_first = h_prev * (diag1 - off1) + off1 * rs
        u_rest  = c * rs
        layer 0:   hidden = relu(u_first + x_t @ dka_0 + b_0)
        layer k>0: hidden = relu(u_rest + hidden
                                 + (x_t - hidden @ dkT_{k-1}) @ dka_k + b_k)

    fold_ref packs [diag1 (2r,), off1 (2r, broadcast), c (2r, broadcast)]
    as a (3, 2r) f32 block; dkT/dka are the thin factored weights, VMEM
    -resident across the whole time grid."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_carry[:] = h0_ref[:]

    diag1 = fold_ref[0][None, :]
    off1 = fold_ref[1][0]
    c_uk = fold_ref[2][0]

    h_prev = h_carry[:]
    for ct in range(block_t):
        x_t = x_ref[ct]
        rs = jnp.sum(h_prev, axis=1, keepdims=True)
        u_first = h_prev * (diag1 - off1) + off1 * rs
        u_rest = c_uk * rs
        hidden = None
        for k in range(k_layers):
            if k == 0:
                pre = u_first + _dot(x_t, dka_ref[0])
            else:
                resid = x_t - _dot(hidden, dkt_ref[k - 1])
                pre = u_rest + hidden + _dot(resid, dka_ref[k])
            hidden = jnp.maximum(pre + b_ref[k][None, :], 0.0)
        m_t = m_ref[ct]  # (B, 1)
        h_prev = jnp.where(m_t > 0, hidden, h_prev)
        out_ref[ct] = h_prev
    h_carry[:] = h_prev


def _kernel_factored_interleaved(x_ref, m_ref, h0_ref, fold_ref, dkt_ref,
                                 dka_ref, b_ref, out_ref, h_carry, *,
                                 k_layers, block_t, half):
    """Two independent batch groups per grid step (DESIGN §7 experiment):
    the factored step's 3K-1 matmuls form one DEPENDENT chain, so the MXU
    stalls between them; splitting the batch into two halves exposes two
    independent chains whose matmuls the scheduler can overlap -- each
    group's matmul issues during the other's dependency stall.  Costs half
    the M dimension per matmul (64 rows at B=128), wins if stall overlap
    beats the lost row occupancy."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_carry[:] = h0_ref[:]

    diag1 = fold_ref[0][None, :]
    off1 = fold_ref[1][0]
    c_uk = fold_ref[2][0]

    h_a = h_carry[:half]
    h_b = h_carry[half:]
    for ct in range(block_t):
        x_a = x_ref[ct, :half]
        x_b = x_ref[ct, half:]
        rs_a = jnp.sum(h_a, axis=1, keepdims=True)
        rs_b = jnp.sum(h_b, axis=1, keepdims=True)
        u_first_a = h_a * (diag1 - off1) + off1 * rs_a
        u_first_b = h_b * (diag1 - off1) + off1 * rs_b
        u_rest_a = c_uk * rs_a
        u_rest_b = c_uk * rs_b
        hid_a = hid_b = None
        for k in range(k_layers):
            if k == 0:
                pre_a = u_first_a + _dot(x_a, dka_ref[0])
                pre_b = u_first_b + _dot(x_b, dka_ref[0])
            else:
                resid_a = x_a - _dot(hid_a, dkt_ref[k - 1])
                resid_b = x_b - _dot(hid_b, dkt_ref[k - 1])
                pre_a = u_rest_a + hid_a + _dot(resid_a, dka_ref[k])
                pre_b = u_rest_b + hid_b + _dot(resid_b, dka_ref[k])
            hid_a = jnp.maximum(pre_a + b_ref[k][None, :], 0.0)
            hid_b = jnp.maximum(pre_b + b_ref[k][None, :], 0.0)
        m_t = m_ref[ct]
        h_a = jnp.where(m_t[:half] > 0, hid_a, h_a)
        h_b = jnp.where(m_t[half:] > 0, hid_b, h_b)
        out_ref[ct, :half] = h_a
        out_ref[ct, half:] = h_b
    h_carry[:half] = h_a
    h_carry[half:] = h_b


def drnmf_scan_pallas_factored(x, step_mask, h0, diag1, off1, c_uk,
                               dkt_stack, dka_stack, b_stack,
                               interpret: bool = False,
                               vmem_limit_bytes: int | None = None,
                               block_t: int = 2,
                               interleave: bool = False):
    """Factored-weights fused scan: x (B, T, F); h0 (B, 2r);
    diag1 (2r,); off1/c_uk scalars; dkt_stack (K-1, 2r, F) = Dhat_k^T
    (dummy (1, ...) when K == 1); dka_stack (K, F, 2r) = Dhat_k/alph_k;
    b_stack (K, 2r).  Returns (B, T, 2r) float32 hidden states."""
    bsz, t_len, f = x.shape
    n2r = h0.shape[-1]
    k_layers = dka_stack.shape[0]

    fold = jnp.stack([
        jnp.asarray(diag1, jnp.float32),
        jnp.broadcast_to(jnp.asarray(off1, jnp.float32), (n2r,)),
        jnp.broadcast_to(jnp.asarray(c_uk, jnp.float32), (n2r,)),
    ])  # (3, 2r)

    if vmem_limit_bytes is None:
        def pad128(n):
            return -(-n // 128) * 128

        wbytes = dka_stack.dtype.itemsize
        weights = (
            (max(1, k_layers - 1) + k_layers) * pad128(f) * pad128(n2r)
            * wbytes
            + (k_layers + 3) * pad128(n2r) * 4
        )
        act = (
            2 * block_t * bsz * (pad128(f) + pad128(n2r))
            + 6 * bsz * pad128(n2r)
        ) * 4
        vmem_limit_bytes = min(int((weights + act) * 1.25), 126 * 1024 * 1024)

    xT = jnp.swapaxes(x, 0, 1)
    mT = jnp.swapaxes(step_mask, 0, 1)[..., None].astype(jnp.float32)

    block_t = max(1, min(block_t, t_len))
    pad_t = (-t_len) % block_t
    if pad_t:
        xT = jnp.pad(xT, ((0, pad_t), (0, 0), (0, 0)))
        mT = jnp.pad(mT, ((0, pad_t), (0, 0), (0, 0)))
    t_pad = t_len + pad_t

    grid = (t_pad // block_t,)
    const = lambda t: (0, 0)
    const3 = lambda t: (0, 0, 0)

    if interleave and bsz % 2 == 0:
        kern = partial(_kernel_factored_interleaved, k_layers=k_layers,
                       block_t=block_t, half=bsz // 2)
    else:
        kern = partial(_kernel_factored, k_layers=k_layers, block_t=block_t)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_t, bsz, f), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bsz, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, n2r), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n2r), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(dkt_stack.shape, const3, memory_space=pltpu.VMEM),
            pl.BlockSpec(dka_stack.shape, const3, memory_space=pltpu.VMEM),
            pl.BlockSpec(b_stack.shape, const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, bsz, n2r), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, bsz, n2r), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bsz, n2r), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
    )(xT, mT, h0, fold, dkt_stack, dka_stack, b_stack)
    return jnp.swapaxes(out[:t_len], 0, 1)
