"""f32 matmul-precision scoping for whole model stacks.

JAX's DEFAULT matmul precision lowers f32 dots through bf16 MXU passes on
TPU (the TF32 analog) — measured 4.5e-3 max logits rel err vs a CPU f32
reference on the LLM stack before its per-dot gate (llm/model._pf32). The
diffusion / ASR / TTS stacks run dozens of plain ``jnp.dot``/``einsum``
calls; instead of threading ``precision=`` through every site, their public
entry points scope the whole forward in
``jax.default_matmul_precision("highest")`` when the model's weights are
genuinely f32. The context participates in the jit trace key, so cached
executables stay consistent.

Reference parity: the reference keeps f32 exact unless PYGPUKIT_ALLOW_TF32
opts into fast mode (native/ops/matmul/matmul.cu:56-97) — same gate here.
"""

from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp

_LOW = (jnp.bfloat16, jnp.float16)


def f32_matmul_context(params):
    """``jax.default_matmul_precision("highest")`` when every floating leaf
    of ``params`` is f32 (bf16/f16 models keep fast DEFAULT — their inputs
    carry no extra precision to protect; norm weights alone don't count
    because mixed-precision models keep f32 norms by design).
    PYGPUKIT_ALLOW_TF32=1 opts into fast mode everywhere."""
    if os.environ.get("PYGPUKIT_ALLOW_TF32", "0") == "1":
        return contextlib.nullcontext()
    dtypes = [getattr(leaf, "dtype", None) for leaf in jax.tree.leaves(params)]
    has_f32 = any(d == jnp.float32 for d in dtypes)
    # == (not `in set`): np.dtype hashes differently from the scalar type
    has_low = any(any(d == lo for lo in _LOW) for d in dtypes if d is not None)
    if has_f32 and not has_low:
        return jax.default_matmul_precision("highest")
    return contextlib.nullcontext()
