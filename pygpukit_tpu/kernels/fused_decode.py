"""Fused whole-model decode step — ONE Pallas kernel owns every per-layer
projection (q/k/v/o/gate/up/down), the norms, RoPE, and fixed-cache attention
for all layers of a batch-1 decode step.

Why (reference + round-1 roofline): decode is HBM-bandwidth-bound — the step
must stream every weight byte once. XLA's matvec lowering runs at ~77% of HBM
peak on v5e (docs/performance.md "Decode"), and per-projection Pallas GEMVs
inside ``lax.scan`` collapse to ~120 GB/s because each launch re-pays pipeline
warmup for a ~1-2 MB stream. The reference's CUDA GEMV hits 98-101% of its
HBM peak (BASELINE.md GEMV table, native/ops/matmul/gemv/) — this kernel is
the TPU answer: a single kernel whose hand-rolled double-buffered DMA chain
never stops streaming across projection and layer boundaries.

Design:
- Weights stay in HBM (``memory_space=ANY``); the kernel streams column tiles
  into ping-pong VMEM pools (class A: [H, TN_A] for the six H-row
  projections, class B: [I, TN_B] for w_down) via ``make_async_copy``. Every
  tile's DMA starts while the previous tile computes; the last tile of each
  projection starts the FIRST tile of the next projection, and the last tile
  of the layer starts layer l+1's first tile — the stream never drains (the
  boundary bubbles are what killed the per-projection formulation).
- Attention runs per kv-head GROUP: the G roped query heads are staged into
  a [G, D] scratch with static row stores (no Mosaic reshapes/relayouts),
  then each group is two MXU dots + one masked softmax. The current token's
  k/v never touch the cache inside the kernel: its attention contribution is an explicit
  append term (score ``q·k_new`` joins the softmax), and k_new/v_new are
  kernel outputs the XLA caller scatters into the cache — cache mutation
  stays outside, mirroring the reference's graph-with-holes split
  (m1_graph.py: KV update outside the captured graph) without the holes.
- Hidden state lives in a [1, H] bf16 VMEM scratch across the whole layer
  loop; residual adds happen tile-wise into it, matching the XLA decode
  path's numerics (every projection output rounds through bf16).

Supported configs (``supports``): rmsnorm, NeoX split-half RoPE, GQA, SwiGLU,
no biases, no QK-norm, head_dim*num_heads == hidden, dims divisible by the
tile sizes, cache length <= 2048 (a layer's K/V slice is held whole in VMEM).
Everything else falls back to the XLA decode path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32
_BF16 = jnp.bfloat16


def _pick_tile(n: int, candidates=(512, 256, 128)) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return 0


def supports(*, hidden: int, intermediate: int, n_heads: int, n_kv_heads: int,
             head_dim: int, max_seq: int, norm_type: str, activation: str,
             use_rope: bool, has_bias: bool, use_qk_norm: bool,
             is_moe: bool) -> bool:
    """Static eligibility for the fused decode kernel."""
    tn_a = _pick_tile(hidden)
    tn_b = _pick_tile(hidden, (256, 128))
    kv_d = n_kv_heads * head_dim
    return (norm_type == "rmsnorm" and activation == "silu" and use_rope
            and not has_bias and not use_qk_norm and not is_moe
            and n_heads * head_dim == hidden
            and tn_a > 0 and tn_b > 0
            and intermediate % tn_a == 0
            and kv_d <= tn_a and kv_d % 128 == 0
            and head_dim % 2 == 0 and head_dim <= 128
            and max_seq % 128 == 0 and max_seq <= 2048)


def _make_kernel(dims, eps: float):
    (L, H, I, HQ, HK, D, MAX, TN_A, TN_B) = dims
    KVD = HK * D
    G = HQ // HK
    NQ = H // TN_A          # wq col tiles (HqD == H)
    NO = H // TN_A          # wo col tiles
    NG = I // TN_A          # wg / wu col tiles
    ND = H // TN_B          # wd col tiles
    half = D // 2
    scale = 1.0 / math.sqrt(D)

    def kernel(pos_ref, h0, cosr, sinr, attn_nw, mlp_nw, final_nw,
               wq, wk, wv, wo, wg, wu, wd, kc, vc,
               h_out, k_new, v_new,
               x_s, qv, attnv, g_s, u_s, act_s, kn_s, qg_s,
               bufA, bufB, kbuf, vbuf,
               semA, semB, semK, semV):

        def dma_a(layer, w_ref, tile, slot):
            # tiled arena [L, NT, K, TN]: .at[l, t] is ONE contiguous block
            # (column slices of row-major weights would be K separate 1-2KB
            # strided segments — DMA bandwidth death)
            return pltpu.make_async_copy(
                w_ref.at[layer, tile], bufA.at[slot], semA.at[slot])

        def dma_kvw(layer, w_ref, slot):
            # wk/wv are narrow enough to stream whole: [H, KVD] contiguous
            return pltpu.make_async_copy(
                w_ref.at[layer], bufA.at[slot, :, 0:KVD], semA.at[slot])

        def dma_b(layer, tile, slot):
            return pltpu.make_async_copy(
                wd.at[layer, tile], bufB.at[slot], semB.at[slot])

        def dma_k(layer):
            return pltpu.make_async_copy(kc.at[layer], kbuf, semK)

        def dma_v(layer):
            return pltpu.make_async_copy(vc.at[layer], vbuf, semV)

        def rms(v, w):
            vf = v.astype(_F32)
            var = jnp.mean(vf * vf, axis=-1, keepdims=True)
            return (vf * jax.lax.rsqrt(var + eps)
                    * w.astype(_F32)).astype(_BF16)

        # ---------------- prologue: start the first DMAs -------------------
        dma_a(0, wq, 0, 0).start()
        dma_k(0).start()
        dma_v(0).start()
        x_s[:] = h0[:].astype(_BF16)

        def layer_body(l, carry):
            # The emitted per-layer program is identical every iteration, so
            # static slot indices repeat exactly; A-stream slots follow the
            # program-order DMA index, the B stream restarts at 0 per layer.
            x1 = rms(x_s[:], attn_nw[pl.ds(l, 1), :])

            # ---- wq tiles -> qv (A indices 0..NQ-1) ------------------------
            for t in range(NQ):
                if t + 1 < NQ:
                    dma_a(l, wq, t + 1, (t + 1) % 2).start()
                else:
                    dma_kvw(l, wk, (t + 1) % 2).start()
                dma_a(l, wq, t, t % 2).wait()
                qv[0:1, t * TN_A:(t + 1) * TN_A] = jnp.dot(
                    x1, bufA[t % 2], preferred_element_type=_F32).astype(_BF16)

            # ---- wk (A index NQ) -------------------------------------------
            dma_kvw(l, wv, (NQ + 1) % 2).start()
            dma_kvw(l, wk, NQ % 2).wait()
            kproj = jnp.dot(x1, bufA[NQ % 2, :, 0:KVD],
                            preferred_element_type=_F32).astype(_BF16)

            # ---- wv (A index NQ+1) -----------------------------------------
            dma_a(l, wo, 0, NQ % 2).start()
            dma_kvw(l, wv, (NQ + 1) % 2).wait()
            vproj = jnp.dot(x1, bufA[(NQ + 1) % 2, :, 0:KVD],
                            preferred_element_type=_F32).astype(_BF16)

            # ---- rope + attention (per head, no reshapes) ------------------
            pos = pos_ref[0]
            c = cosr[0:1, 0:half].astype(_F32)               # [1,half]
            s = sinr[0:1, 0:half].astype(_F32)

            def rope_pair(vec, off):
                v0 = vec[0:1, off:off + half].astype(_F32)
                v1 = vec[0:1, off + half:off + 2 * half].astype(_F32)
                return ((v0 * c - v1 * s).astype(_BF16),
                        (v1 * c + v0 * s).astype(_BF16))

            # static-offset stores into a staging row (Mosaic rejects
            # dynamic stores at unaligned lane offsets), then ONE aligned
            # full-row store at the traced layer index.
            for hk_i in range(HK):
                r0, r1 = rope_pair(kproj, hk_i * D)
                kn_s[0:1, hk_i * D:hk_i * D + half] = r0.astype(_F32)
                kn_s[0:1, hk_i * D + half:hk_i * D + 2 * half] = (
                    r1.astype(_F32))
            k_new[pl.ds(l, 1), :] = kn_s[:]
            v_new[pl.ds(l, 1), :] = vproj.astype(_F32)

            kv_mask = (jax.lax.broadcasted_iota(jnp.int32, (1, MAX), 1)
                       < pos).astype(_F32)                           # [1,MAX]
            neg = (1.0 - kv_mask) * -1e30
            dma_k(l).wait()
            dma_v(l).wait()

            # Batched per kv-head GROUP: G roped query heads are staged into
            # a [G, D] scratch (static row stores), then each group costs
            # two MXU dots + one masked softmax instead of G× narrow-lane
            # per-head ops (the per-head formulation spent the decode budget
            # on Mosaic sub-128-lane relayouts).
            for hk_i in range(HK):
                for g_i in range(G):
                    r0, r1 = rope_pair(qv, (hk_i * G + g_i) * D)
                    qg_s[g_i:g_i + 1, :] = jnp.concatenate([r0, r1], axis=1)
                kh = kbuf[:, hk_i * D:(hk_i + 1) * D]                # [MAX,D]
                sc = jax.lax.dot_general(
                    qg_s[:], kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=_F32) * scale + neg       # [G,MAX]
                kn_g = kn_s[0:1, hk_i * D:(hk_i + 1) * D].astype(_BF16)
                s_new = jax.lax.dot_general(
                    qg_s[:], kn_g, (((1,), (1,)), ((), ())),
                    preferred_element_type=_F32) * scale             # [G,1]
                m = jnp.maximum(jnp.max(sc, axis=-1, keepdims=True), s_new)
                p = jnp.exp(sc - m) * kv_mask                        # [G,MAX]
                p_new = jnp.exp(s_new - m)                           # [G,1]
                denom = jnp.sum(p, axis=-1, keepdims=True) + p_new
                vh = vbuf[:, hk_i * D:(hk_i + 1) * D].astype(_F32)   # [MAX,D]
                o = jax.lax.dot_general(
                    p, vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=_F32,
                    precision=jax.lax.Precision.HIGHEST)             # [G,D]
                o = o + p_new * vproj[0:1, hk_i * D:(hk_i + 1) * D].astype(_F32)
                o = (o / denom).astype(_BF16)
                for g_i in range(G):
                    attnv[0:1, (hk_i * G + g_i) * D:(hk_i * G + g_i + 1) * D] = (
                        o[g_i:g_i + 1, :])

            # ---- wo tiles: x += attn @ wo (A indices NQ+2 ..) --------------
            av = attnv[:]
            for t in range(NO):
                idx = NQ + 2 + t
                if t + 1 < NO:
                    dma_a(l, wo, t + 1, (idx + 1) % 2).start()
                else:
                    dma_a(l, wg, 0, (idx + 1) % 2).start()
                dma_a(l, wo, t, idx % 2).wait()
                delta = jnp.dot(av, bufA[idx % 2],
                                preferred_element_type=_F32).astype(_BF16)
                x_s[0:1, t * TN_A:(t + 1) * TN_A] = (
                    x_s[0:1, t * TN_A:(t + 1) * TN_A] + delta)

            # prefetch next layer's KV while the MLP weights stream
            @pl.when(l + 1 < L)
            def _():
                dma_k(l + 1).start()
                dma_v(l + 1).start()

            x2 = rms(x_s[:], mlp_nw[pl.ds(l, 1), :])

            # ---- wg tiles -> g ---------------------------------------------
            base = NQ + 2 + NO
            for t in range(NG):
                idx = base + t
                if t + 1 < NG:
                    dma_a(l, wg, t + 1, (idx + 1) % 2).start()
                else:
                    dma_a(l, wu, 0, (idx + 1) % 2).start()
                dma_a(l, wg, t, idx % 2).wait()
                g_s[0:1, t * TN_A:(t + 1) * TN_A] = jnp.dot(
                    x2, bufA[idx % 2],
                    preferred_element_type=_F32).astype(_BF16)

            # ---- wu tiles -> u; act = silu(g)*u ----------------------------
            base = NQ + 2 + NO + NG
            for t in range(NG):
                idx = base + t
                if t + 1 < NG:
                    dma_a(l, wu, t + 1, (idx + 1) % 2).start()
                else:
                    dma_b(l, 0, 0).start()
                dma_a(l, wu, t, idx % 2).wait()
                u_s[0:1, t * TN_A:(t + 1) * TN_A] = jnp.dot(
                    x2, bufA[idx % 2],
                    preferred_element_type=_F32).astype(_BF16)

            gf = g_s[:].astype(_F32)
            act_s[:] = ((gf / (1.0 + jnp.exp(-gf)))
                        * u_s[:].astype(_F32)).astype(_BF16)

            # ---- wd tiles: x += act @ wd (B stream) ------------------------
            actv = act_s[:]
            for t in range(ND):
                if t + 1 < ND:
                    dma_b(l, t + 1, (t + 1) % 2).start()
                else:
                    @pl.when(l + 1 < L)
                    def _():
                        dma_a(l + 1, wq, 0, 0).start()
                dma_b(l, t, t % 2).wait()
                delta = jnp.dot(actv, bufB[t % 2],
                                preferred_element_type=_F32).astype(_BF16)
                x_s[0:1, t * TN_B:(t + 1) * TN_B] = (
                    x_s[0:1, t * TN_B:(t + 1) * TN_B] + delta)
            return carry

        jax.lax.fori_loop(0, L, layer_body, 0)
        h_out[:] = rms(x_s[:], final_nw[0:1, :])

    return kernel


def fused_decode_step(h0, cos_p, sin_p, pos, wq, wk, wv, wo, wg, wu, wd,
                      attn_norm, mlp_norm, final_norm, k_cache, v_cache,
                      *, n_heads: int, n_kv_heads: int, head_dim: int,
                      eps: float = 1e-5, interpret: bool = False):
    """Run the fused decode step.

    h0 [1,H] bf16 (embedded token); cos_p/sin_p [1,D] f32 (RoPE row at pos);
    pos [1] int32; weights PRE-TILED via ``tile_weight`` — wq/wo/wg/wu
    [L, NT, H, TN_A], wd [L, NT, I, TN_B] (each tile one contiguous DMA
    block); wk/wv remain [L, H, KvD]; attn_norm/mlp_norm [L,H] f32;
    final_norm [1,H] f32; caches [L, MAX, Hk*D] bf16 (kv heads flattened). Returns (h_final [1,H] bf16, k_new [L,Hk*D] f32,
    v_new [L,Hk*D] f32) — the caller scatters k_new/v_new into the caches
    at ``pos`` and runs the LM head.
    """
    L = wq.shape[0]
    H = wq.shape[2]
    I = wg.shape[1] * wg.shape[3]
    MAX = k_cache.shape[1]
    KVD = n_kv_heads * head_dim
    TN_A = _pick_tile(H)
    TN_B = _pick_tile(H, (256, 128))
    dims = (L, H, I, n_heads, n_kv_heads, head_dim, MAX, TN_A, TN_B)
    kernel = _make_kernel(dims, float(eps))

    out_shape = (
        jax.ShapeDtypeStruct((1, H), _BF16),      # h_out
        # f32: Mosaic requires dynamic sublane indices into bf16 buffers to
        # be even (2-row packing); the per-layer row store at traced l would
        # not typecheck in bf16. These are tiny ([L, KvD]); cast outside.
        jax.ShapeDtypeStruct((L, KVD), _F32),     # k_new
        jax.ShapeDtypeStruct((L, KVD), _F32),     # v_new
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[vspec, vspec, vspec, vspec, vspec, vspec,
                  aspec, aspec, aspec, aspec, aspec, aspec, aspec,
                  aspec, aspec],
        out_specs=(vspec, vspec, vspec),
        scratch_shapes=[
            pltpu.VMEM((1, H), _BF16),            # x_s
            pltpu.VMEM((1, H), _BF16),            # qv (HqD == H)
            pltpu.VMEM((1, H), _BF16),            # attnv
            pltpu.VMEM((1, I), _BF16),            # g_s
            pltpu.VMEM((1, I), _BF16),            # u_s
            pltpu.VMEM((1, I), _BF16),            # act_s
            pltpu.VMEM((1, KVD), _F32),           # kn_s (staging row)
            pltpu.VMEM((n_heads // n_kv_heads, head_dim), _BF16),  # qg_s
            pltpu.VMEM((2, H, TN_A), _BF16),      # bufA
            pltpu.VMEM((2, I, TN_B), _BF16),      # bufB
            pltpu.VMEM((MAX, KVD), _BF16),        # kbuf
            pltpu.VMEM((MAX, KVD), _BF16),        # vbuf
            pltpu.SemaphoreType.DMA((2,)),        # semA
            pltpu.SemaphoreType.DMA((2,)),        # semB
            pltpu.SemaphoreType.DMA(()),          # semK
            pltpu.SemaphoreType.DMA(()),          # semV
        ],
    )
    fn = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    return fn(pos, h0, cos_p, sin_p, attn_norm, mlp_norm, final_norm,
              wq, wk, wv, wo, wg, wu, wd, k_cache, v_cache)


def tile_weight(w, tn: int):
    """[L, K, N] -> [L, N//tn, K, tn] contiguous tile arena (one DMA block
    per tile; the column-sliced row-major layout DMAs at ~1/10 bandwidth)."""
    L, K, N = w.shape
    # jnp arrays materialise transposes on use; force the copy eagerly so
    # the arena is row-major contiguous in HBM
    t = w.reshape(L, K, N // tn, tn).transpose(0, 2, 1, 3)
    return jax.block_until_ready(t + jnp.zeros((), w.dtype))


def tile_sizes(hidden: int):
    return _pick_tile(hidden), _pick_tile(hidden, (256, 128))
