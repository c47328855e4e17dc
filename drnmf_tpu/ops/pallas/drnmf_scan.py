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
            out_ref, h_carry, *, k_layers):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_carry[:] = h0_ref[:]

    h_prev = h_carry[:]
    x_t = x_ref[0]
    hidden = None
    for k in range(k_layers):
        u = u1_ref[:] if k == 0 else uk_ref[:]
        pre = _dot(h_prev, u)
        if k > 0:
            pre = pre + _dot(hidden, s_ref[k - 1])
        pre = pre + _dot(x_t, w_ref[k])
        hidden = jnp.maximum(pre + b_ref[k][None, :], 0.0)
    m_t = m_ref[0]  # (B, 1)
    h_new = jnp.where(m_t > 0, hidden, h_prev)
    h_carry[:] = h_new
    out_ref[0] = h_new


def drnmf_scan_pallas(x, step_mask, h0, u1, uk, s_stack, w_stack, b_stack,
                      interpret: bool = False):
    """Run the recurrence.

    x: (B, T, F); step_mask: (B, T) bool; h0: (B, 2r);
    u1, uk: (2r, 2r); s_stack: (K-1, 2r, 2r) (dummy (1, ...) when K == 1);
    w_stack: (K, F, 2r); b_stack: (K, 2r).
    Returns hidden states (B, T, 2r) float32.
    """
    bsz, t_len, f = x.shape
    n2r = h0.shape[-1]
    k_layers = w_stack.shape[0]

    xT = jnp.swapaxes(x, 0, 1)  # (T, B, F)
    mT = jnp.swapaxes(step_mask, 0, 1)[..., None].astype(jnp.float32)  # (T, B, 1)

    grid = (t_len,)
    const = lambda t: (0, 0)
    const3 = lambda t: (0, 0, 0)

    out = pl.pallas_call(
        partial(_kernel, k_layers=k_layers),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bsz, f), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, n2r), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n2r, n2r), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n2r, n2r), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(s_stack.shape, const3, memory_space=pltpu.VMEM),
            pl.BlockSpec(w_stack.shape, const3, memory_space=pltpu.VMEM),
            pl.BlockSpec(b_stack.shape, const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bsz, n2r), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, bsz, n2r), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bsz, n2r), jnp.float32)],
        interpret=interpret,
    )(xT, mT, h0, u1, uk, s_stack, w_stack, b_stack)
    return jnp.swapaxes(out, 0, 1)


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
