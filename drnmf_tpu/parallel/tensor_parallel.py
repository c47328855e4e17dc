"""Tensor-parallel DR-NMF recurrence: hidden dimension sharded over a mesh.

SURVEY.md section 2 notes TP is unnecessary at the paper's r=1000 (the
weights are ~50 MB), but a production dictionary can grow past one chip's
HBM: U and S are (2r, 2r), i.e. 4 GB at r=16k in f32.  This module shards
the 2r axis Megatron-style:

* every per-layer matrix (U_k, S_k, W_k) and bias is column-sharded over the
  'tp' mesh axis; each device computes its (B, 2r/P) slice of every layer's
  pre-activation with purely local matmuls;
* the layer output must be visible in full to the next matmul's contraction
  axis, so each layer ends with an ``all_gather`` of the (B, 2r/P) hidden
  slice over ICI -- K gathers per timestep, each 1/P'th of the hidden state.

Exact: the math is the single-device recurrence with a different summation
layout; the parity test asserts equality.

Scale note: this v1 materializes the full effective matrices on the default
device before sharding them (fine through ~r=4k); dictionaries that do not
fit one chip additionally need the alt->effective parameter maps computed
under sharding constraints -- tracked as follow-up work.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.drnmf import _ACTIVATIONS, _effective_matrices, _precision

_COMPILED = {}  # (config, mesh axis sizes, shapes) -> jitted shard_map


def drnmf_scan_tp(params, config, x, step_mask, mesh, axis_name="tp"):
    """Hidden states with the 2r axis sharded over ``axis_name``.

    x: (B, T, F); returns (B, T, 2r) replicated (gathered) hidden states,
    equal to the single-device scan.  hidden_dim must divide the mesh axis.
    """
    n_tp = mesh.shape[axis_name]
    h_dim = config.hidden_dim
    if h_dim % n_tp:
        raise ValueError(f"hidden_dim={h_dim} not divisible by tp={n_tp}")
    if config.return_all_hidden or config.dropout_W or config.dropout_U:
        raise NotImplementedError("tp scan supports the inference cell only")

    U, S, W, b = _effective_matrices(params, config)
    if config.nonnegative:
        h0 = jax.nn.softplus(params["log_h0"])
    else:
        h0 = params["h0"]
    prec = _precision(config)
    act = _ACTIVATIONS[config.activation]
    K = config.K_layers

    u_stack = jnp.stack(U)  # (K, 2r, 2r)
    s_stack = jnp.stack(S) if S else jnp.zeros((1, h_dim, h_dim), jnp.float32)
    w_stack = jnp.stack(W)  # (K, F, 2r)
    b_stack = jnp.stack(b)  # (K, 2r)

    def local(u_loc, s_loc, w_loc, b_loc, x_loc, m_loc, h0_loc):
        # *_loc are column shards: u (K, 2r, 2r/P), s, w (K, F, 2r/P),
        # b (K, 2r/P); x_loc/m_loc replicated
        bsz = x_loc.shape[0]
        xT = jnp.swapaxes(x_loc, 0, 1)
        mT = jnp.swapaxes(m_loc, 0, 1)
        h_init = jax.lax.pcast(
            jnp.broadcast_to(h0_loc[None, :], (bsz, h_dim)),
            axis_name, to="varying",
        )  # the carry becomes device-varying after the first all_gather

        def step(h_prev, inp):
            x_t, m_t = inp
            hidden = None
            for k in range(K):
                pre = jnp.dot(h_prev, u_loc[k], precision=prec,
                              preferred_element_type=jnp.float32)
                if k > 0:
                    pre = pre + jnp.dot(hidden, s_loc[k - 1], precision=prec,
                                        preferred_element_type=jnp.float32)
                if config.connect_input_to_layers:
                    pre = pre + jnp.dot(x_t, w_loc[k], precision=prec,
                                        preferred_element_type=jnp.float32)
                local_hidden = act(pre + b_loc[k])  # (B, 2r/P)
                # next layer contracts over the FULL 2r axis
                hidden = jax.lax.all_gather(
                    local_hidden, axis_name, axis=1, tiled=True
                )
            h_new = jnp.where(m_t[:, None], hidden, h_prev)
            return h_new, h_new

        _, hs = jax.lax.scan(step, h_init, (xT, mT))
        return jnp.swapaxes(hs, 0, 1)

    # cache the jitted program: jit keys on the wrapper object, so building
    # a fresh one per call would recompile every invocation (minutes per
    # compile through the axon tunnel)
    cache_key = (config, axis_name, tuple(x.shape),
                 tuple(d.id for d in mesh.devices.flat))
    fn = _COMPILED.get(cache_key)
    if fn is None:
        shard = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(None, None, axis_name),  # U column shards
                P(None, None, axis_name),  # S
                P(None, None, axis_name),  # W
                P(None, axis_name),        # b
                P(),                       # x replicated
                P(),                       # mask replicated
                P(),                       # h0 replicated
            ),
            out_specs=P(),
            # the gathered hidden states are value-replicated but typed
            # varying (they flow from sharded weights); the parity test pins
            # correctness
            check_vma=False,
        )
        fn = jax.jit(shard)
        _COMPILED[cache_key] = fn
    put = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    return fn(
        put(u_stack, P(None, None, axis_name)),
        put(s_stack, P(None, None, axis_name)),
        put(w_stack, P(None, None, axis_name)),
        put(b_stack, P(None, axis_name)),
        put(x, P()), put(step_mask, P()), put(h0, P()),
    )
