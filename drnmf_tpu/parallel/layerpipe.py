"""Layer-pipelined DR-NMF recurrence: the K unfolds sharded over a 'pp' axis.

Completes the parallelism matrix (dp / tp / sp / 2-D dp x tp / FSDP /
**pp**) for the one axis the others leave alone: the K unfolded ISTA
layers themselves (SimpleDeepRNN stacking, custom_layers.py:104-412 --
the reference ran all layers on one GPU).  Device p COMPUTES only layer
p; activations hand forward over ICI with ``ppermute``.

The cross-time feedback (layer K-1's masked-held state at t-1 feeds every
layer's U term at t, enhance.py:162-204) makes this a RING pipeline: a
single sequence would serialize around it, so the batch is split into
G = P groups interleaved as a wavefront -- with G equal to the ring
length, layer K-1's state for (g, t-1) travels the ring and arrives at
each stage EXACTLY when that stage processes (g, t), no buffering.
Device p at wave s runs group g = (s-p) % G at time t = (s-p) // G
through its layer: T*G + P - 1 waves, per-device compute 1/P of the
single-device scan.  Exact: the schedule only reorders where layer
applications run, not the math (parity with ``_scan_hidden`` is pinned
bitwise-level by test).

What pp shards is COMPUTE, not weight residency: params ride in
replicated (``in_specs=P()``) and every device materializes the stacked
per-layer factors, selecting its own layer's slice by ``axis_index`` --
so per-device HBM for weights is unchanged versus the single-device
scan.  (True per-layer residency would shard the stacks over 'pp' in
``in_specs``; at this model family's weight scale -- K x (F, 2r) ~ 2 MB
per layer -- there is nothing to win, so the simpler replicated layout
is kept.)  What pp uniquely divides is the per-device *matmul work* of
the depth axis, 1/K of the layer applications per device.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.drnmf import (FoldedU, _ACTIVATIONS, _effective_matrices,
                            _precision)
from ._cache import CompiledCache

# (config, axis, shapes, device ids) -> jitted shard_map
_COMPILED = CompiledCache()


def drnmf_scan_layer_pipelined(params, config, x, step_mask, mesh,
                               axis_name="pp"):
    """Hidden states of the DR-NMF recurrence with the LAYER axis sharded.

    Requires ``config.K_layers == P`` (one layer per 'pp'-axis device) and
    ``B`` divisible by P (the G = P wavefront groups).  Supports the plain
    cell (relu-family activation, connect_input_to_layers, no
    return_all_hidden, no dropout), folded or dense U, factored or dense S.
    Returns (B, T, 2r) hidden states identical to the single-device scan.
    """
    n_pp = int(mesh.shape[axis_name])
    K = config.K_layers
    if K != n_pp:
        raise ValueError(f"K_layers={K} must equal the pp axis size {n_pp}")
    if K < 2:
        # degenerate pipeline (and the K=1 model has no S matrices for the
        # dense-S trace path to reference) -- use the plain scan instead
        raise ValueError(
            "layer pipelining requires K_layers >= 2; use _scan_hidden")
    if config.return_all_hidden or config.dropout_W or config.dropout_U:
        raise NotImplementedError(
            "layer-pipelined scan supports the plain cell only")
    if not config.connect_input_to_layers:
        raise NotImplementedError(
            "layer-pipelined scan requires connect_input_to_layers")
    bsz, t_total, f_dim = x.shape
    if bsz % n_pp:
        raise ValueError(f"B={bsz} not divisible by pp={n_pp}")
    n_groups = n_pp  # G = P: ring latency exactly hidden, no buffering
    gsz = bsz // n_groups
    h_dim = config.hidden_dim
    act = _ACTIVATIONS[config.activation]
    prec = _precision(config)

    def local(params_loc, x_full, m_full):
        U, S, W, b = _effective_matrices(params_loc, config,
                                         fold_u=True, factor_s=True)
        if config.nonnegative:
            h0 = jax.nn.softplus(params_loc["log_h0"])
        else:
            h0 = params_loc["h0"]
        p = jax.lax.axis_index(axis_name)
        folded = isinstance(U, FoldedU)
        factored = bool(S) and isinstance(S[0], tuple)
        dot = partial(jnp.dot, precision=prec,
                      preferred_element_type=jnp.float32)

        # stack per-layer weights so the (traced) device index selects its
        # own layer; each device reads one (F, 2r) slice per wave
        w_stack = jnp.stack(W)  # (K, F, 2r)
        b_stack = jnp.stack(b)  # (K, 2r)
        if factored:
            dk_stack = jnp.stack([s[0] for s in S])   # (K-1, F, 2r)
            dka_stack = jnp.stack([s[1] for s in S])  # (K-1, F, 2r)
        elif S:
            s_stack = jnp.stack(S)  # (K-1, 2r, 2r), rows-of-S layout
        if not folded:
            # U = [U1^T] + [Uk^T]*(K-1): store the two distinct matrices,
            # not K copies (at 2r=2000 each is 16 MB)
            u_stack = jnp.stack([U[0], U[1] if K > 1 else U[0]])

        def layer_apply(kk, h_prev, hidden, x_t):
            """One layer's pre-activation + activation for its wave tuple.
            ``h_prev``: layer K-1's held state at t-1 (U term source);
            ``hidden``: layer kk-1's output at t (garbage when kk == 0 --
            the where() discards that branch)."""
            if folded:
                rs = jnp.sum(h_prev, axis=-1, keepdims=True)
                t1 = h_prev * (U.diag1 - U.off1) + U.off1 * rs
                u_k = jnp.where(kk == 0, t1,
                                jnp.broadcast_to(U.c * rs, t1.shape))
            else:
                u_k = dot(h_prev, u_stack[jnp.minimum(kk, 1)])
            pre0 = u_k + dot(x_t, w_stack[0])
            km1 = jnp.maximum(kk - 1, 0)
            if factored:
                dk, dka = dk_stack[km1], dka_stack[km1]
                prek = u_k + hidden + dot(x_t - dot(hidden, dk.T), dka)
            else:
                prek = (u_k + dot(hidden, s_stack[km1])
                        + dot(x_t, w_stack[kk]))
            return act(jnp.where(kk == 0, pre0, prek) + b_stack[kk])

        n_waves = t_total * n_groups + n_pp - 1
        ring = [(i, (i + 1) % n_pp) for i in range(n_pp)]
        def vary(v):
            return jax.lax.pcast(v, axis_name, to="varying")
        out0 = vary(jnp.zeros((bsz, t_total, h_dim), jnp.float32))
        bh0 = vary(jnp.zeros((gsz, h_dim), jnp.float32))  # boundary hidden
        hp0 = vary(jnp.zeros((gsz, h_dim), jnp.float32))  # h_prev in flight
        h0_b = jnp.broadcast_to(h0[None, :], (gsz, h_dim))
        last = p == n_pp - 1

        def wave(s, state):
            out, bh, hp = state
            bh_r = jax.lax.ppermute(bh, axis_name, ring)
            hp_r = jax.lax.ppermute(hp, axis_name, ring)
            idx = s - p
            valid = (idx >= 0) & (idx < t_total * n_groups)
            ic = jnp.clip(idx, 0, t_total * n_groups - 1)
            g, t = ic % n_groups, ic // n_groups
            x_t = jax.lax.dynamic_slice(
                x_full, (g * gsz, t, 0), (gsz, 1, f_dim))[:, 0, :]
            m_t = jax.lax.dynamic_slice(m_full, (g * gsz, t), (gsz, 1))[:, 0]
            h_prev = jnp.where(t == 0, h0_b, hp_r)
            h_out = layer_apply(p, h_prev, bh_r, x_t)
            h_held = jnp.where(m_t[:, None], h_out, h_prev)
            upd = jax.lax.dynamic_update_slice(
                out, h_held[:, None, :], (g * gsz, t, 0))
            out = jnp.where(valid & last, upd, out)
            bh = jnp.where(valid, h_out, bh_r)
            # device K-1 injects the next time step's feedback; others
            # forward what they received (bubbles pass through unchanged)
            hp = jnp.where(valid & last, h_held, hp_r)
            return out, bh, hp

        out, _, _ = jax.lax.fori_loop(0, n_waves, wave, (out0, bh0, hp0))
        # outputs live on device K-1 only; everyone else contributes zeros
        return jax.lax.psum(out, axis_name)

    cache_key = (config, axis_name, tuple(x.shape),
                 tuple(d.id for d in mesh.devices.flat))
    fn = _COMPILED.get(cache_key)
    if fn is None:
        shard = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P()),  # everything replicated; layer
            out_specs=P(),             # placement varies via axis_index
        )
        fn = jax.jit(shard)
        _COMPILED.put(cache_key, fn)
    return fn(params, jnp.asarray(x), jnp.asarray(step_mask))
