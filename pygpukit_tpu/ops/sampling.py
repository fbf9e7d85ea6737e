"""Device-side sampling (reference: src/pygpukit/ops/sampling.py:11-144,
native/ops/sampling/sampling.cu incl. seeded RNG at :362).

JAX's counter-based PRNG makes the reference's determinism guarantee
("same seed, same tokens, every run") hold by construction: the key is
explicit state, split per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.array import Array, as_jax, wrap

_NEG_INF = -1e30

_seed_state = {"key": jax.random.PRNGKey(0), "seed": 0}


def set_sampling_seed(seed: int) -> None:
    """Deterministic sampling seed (reference: sampling.cu:362 set_sampling_seed)."""
    _seed_state["key"] = jax.random.PRNGKey(seed)
    _seed_state["seed"] = seed


def _next_key():
    key, sub = jax.random.split(_seed_state["key"])
    _seed_state["key"] = key
    return sub


def sample_greedy_fn(logits):
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_temperature_fn(logits, key, temperature: float = 1.0):
    return jax.random.categorical(key, logits.astype(jnp.float32) / temperature,
                                  axis=-1).astype(jnp.int32)


def sample_topk_fn(logits, key, k: int, temperature: float = 1.0):
    lf = logits.astype(jnp.float32) / temperature
    topv, _ = jax.lax.top_k(lf, k)
    thresh = topv[..., -1:]
    masked = jnp.where(lf < thresh, _NEG_INF, lf)
    return jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)


def sample_topp_fn(logits, key, p: float, temperature: float = 1.0):
    lf = logits.astype(jnp.float32) / temperature
    sorted_logits = jnp.sort(lf, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds p (always keep top-1)
    cutoff_mask = cum - probs > p
    cutoff_logit = jnp.min(
        jnp.where(cutoff_mask, jnp.inf, sorted_logits), axis=-1, keepdims=True)
    masked = jnp.where(lf < cutoff_logit, _NEG_INF, lf)
    return jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)


def sample_token_gpu(logits, temperature: float = 0.0, top_k: int = 0,
                     top_p: float = 0.0, *, out: Array | None = None) -> Array:
    """Device-side sampling; D2H of a single int happens only when the caller
    reads the result (reference: sample_token_gpu)."""
    lj = as_jax(logits)
    if lj.ndim > 1:
        lj = lj[-1]
    if temperature <= 0.0:
        tok = sample_greedy_fn(lj)
    elif top_k > 0:
        tok = sample_topk_fn(lj, _next_key(), top_k, temperature)
    elif 0.0 < top_p < 1.0:
        tok = sample_topp_fn(lj, _next_key(), top_p, temperature)
    else:
        tok = sample_temperature_fn(lj, _next_key(), temperature)
    res = wrap(tok)
    if out is not None:
        out._set_buffer(tok.astype(out.dtype.jax_dtype).reshape(out.shape))
        return out
    return res


def sample_multinomial(probs, *, out: Array | None = None) -> Array:
    pj = as_jax(probs).astype(jnp.float32)
    tok = jax.random.categorical(_next_key(), jnp.log(jnp.maximum(pj, 1e-30)),
                                 axis=-1).astype(jnp.int32)
    if out is not None:
        out._set_buffer(tok.astype(out.dtype.jax_dtype).reshape(out.shape))
        return out
    return wrap(tok)
