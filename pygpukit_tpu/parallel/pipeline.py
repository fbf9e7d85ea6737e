"""Pipeline parallelism: GPipe over a 'pp' mesh axis via shard_map+ppermute.

The reference is single-GPU (no pp); this is TPU-native scaling following
the public scaling-book recipe: the stacked layer pytree [L, ...] is sharded
over 'pp' into contiguous stages (L/P layers each, exactly what lax.scan
already consumes), microbatches stream through a ppermute ring, and the
pipeline bubble is (P-1)/(M+P-1) ticks. Embedding, final norm, and the LM
head run replicated outside the pipelined region.

All control flow is a lax.scan over ticks — one compiled program, no
per-microbatch dispatches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..llm.model import _logits, _norm, layer_stack_fn


def make_pp_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    import numpy as np
    return Mesh(np.asarray(devices), ("pp",))


def _pipeline_body(cfg, layers_local, h_all, rope_cos, rope_sin):
    """Inside shard_map: layers_local is this stage's [L/P, ...] slice;
    h_all [M, S, E] is the full microbatch set (replicated)."""
    pp = lax.axis_size("pp")
    idx = lax.axis_index("pp")
    m = h_all.shape[0]
    stage = functools.partial(layer_stack_fn, cfg, layers_local,
                              rope_cos=rope_cos, rope_sin=rope_sin)

    def tick(carry, t):
        state, outs = carry
        # stage 0 ingests microbatch t (clamped; post-M injections are
        # garbage that never reaches emission before the loop ends)
        inject = h_all[jnp.clip(t, 0, m - 1)]
        cur = jnp.where(idx == 0, inject, state)
        out = stage(h=cur)
        # the last stage emits microbatch t-(P-1)
        m_out = t - (pp - 1)
        emit = (idx == pp - 1) & (m_out >= 0)
        outs = jnp.where(emit,
                         outs.at[jnp.clip(m_out, 0, m - 1)].set(out), outs)
        # ring-shift stage outputs to the next stage
        state = lax.ppermute(out, "pp",
                             [(i, (i + 1) % pp) for i in range(pp)])
        return (state, outs), None

    init = (jnp.zeros_like(h_all[0]), jnp.zeros_like(h_all))
    (_, outs), _ = lax.scan(tick, init, jnp.arange(m + pp - 1))
    # collect the finished microbatches from the last stage
    return lax.psum(jnp.where(idx == pp - 1, outs, jnp.zeros_like(outs)),
                    "pp")


def pipeline_forward_fn(cfg, params, tokens_mb, mesh: Mesh):
    """tokens_mb [M, S] int32 -> logits [M, S, V] f32, with the layer stack
    pipelined over mesh axis 'pp' (num_layers % pp_size == 0)."""
    try:
        from jax import shard_map
    except ImportError:                      # older jax
        from jax.experimental.shard_map import shard_map

    pp = mesh.shape["pp"]
    n_layers = jax.tree.leaves(params["layers"])[0].shape[0]
    if n_layers % pp:
        raise ValueError(f"num_layers ({n_layers}) must divide evenly over "
                         f"the pp axis ({pp})")
    h = jnp.take(params["embed"], tokens_mb, axis=0)         # [M, S, E]
    if cfg.use_position_embed:
        h = h + params["pos_embed"][None, :tokens_mb.shape[1]]

    import inspect
    flag = ("check_vma" if "check_vma" in
            inspect.signature(shard_map).parameters else "check_rep")
    body = shard_map(
        functools.partial(_pipeline_body, cfg),
        mesh=mesh,
        in_specs=(P("pp"), P(), P(), P()),
        out_specs=P(),
        **{flag: False},
    )
    if cfg.use_rope and "rope_cos_long" in params:
        # LongRoPE models: same per-forward factor-table selection the
        # unsharded forward does (model._rope_rows_for)
        from ..llm.model import _rope_rows_for
        s = tokens_mb.shape[1]
        rc, rs = _rope_rows_for(params, 0, s, jnp.int32(s))
    else:
        rc, rs = params.get("rope_cos"), params.get("rope_sin")
    h = body(params["layers"], h, rc, rs)
    h = _norm(cfg, h, params["final_norm_w"], params.get("final_norm_b"))
    return _logits(cfg, params, h)


def shard_params_pp(params: dict, mesh: Mesh) -> dict:
    """Place the layer stack sharded over 'pp' (axis 0 = layers), everything
    else replicated."""
    out = {}
    for k, v in params.items():
        if k == "layers":
            out[k] = {n: jax.device_put(leaf, NamedSharding(mesh, P("pp")))
                      for n, leaf in v.items()}
        elif v is None:
            out[k] = None
        else:
            out[k] = jax.device_put(v, NamedSharding(mesh, P()))
    return out
