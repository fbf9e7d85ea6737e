"""Fused whole-model decode step — ONE Pallas kernel owns every per-layer
projection (q/k/v/o/gate/up/down), the norms, RoPE, and fixed-cache attention
for all layers of a batch-1 decode step.

Why (reference + round-1 roofline): decode is HBM-bandwidth-bound — the step
must stream every weight byte once. XLA's matvec lowering runs at ~77% of HBM
peak on v5e (docs/performance.md "Decode"); the reference's CUDA GEMV hits
98-101% of its HBM peak (BASELINE.md, native/ops/matmul/gemv/). This kernel
is the TPU attempt at the same engineering standard: a single kernel whose
hand-rolled double-buffered DMA chain streams all weights across projection
and layer boundaries.

Measured design history (1B TinyLlama-class, v5e, 256-token chunks):
- per-projection Pallas GEMVs inside lax.scan: ~120 GB/s (dead end);
- column-sliced DMAs of row-major weights: K strided ~1-2 KB segments per
  copy -> 23.4 ms/tok; pre-tiled contiguous arenas -> 8.3;
- per-head attention with sub-128-lane ops -> batched per-kv-group MXU dots
  -> 6.0;
- ~40 small (1-2.8 MB) DMAs per layer: chain capped at ~250-370 GB/s by
  per-DMA issue/wait overhead (ablation: dma-only 8.1 ms, compute-only
  2.7 ms) -> this version plans ~12 MB tiles (v5e VMEM is 128 MB; ~10 DMAs
  per layer instead of ~40).

Design:
- Weights stay in HBM (``memory_space=ANY``) as PRE-TILED contiguous arenas
  [L, NT, K, C] (``tile_weight``); the kernel ping-pongs whole tiles into
  two VMEM pools (class A: [H, CA] for the six H-row projections, class B:
  [I, CD] for w_down). Every tile's DMA starts while the previous tile
  computes; the last tile of each projection starts the FIRST tile of the
  next, and the last tile of the layer starts layer l+1's first — the
  stream never drains.
- Attention runs per kv-head GROUP: the G roped query heads are staged into
  a [G, D] scratch with static row stores (no Mosaic reshapes/relayouts),
  then each group is two MXU dots + one masked softmax. The current token's
  k/v never touch the cache inside the kernel: the append term ``q . k_new``
  joins the softmax, and k_new/v_new are kernel outputs the XLA caller
  scatters into the cache — cache mutation stays outside, mirroring the
  reference's graph-with-holes split (m1_graph.py) without the holes.
- Hidden state lives in a [1, H] bf16 VMEM scratch across the whole layer
  loop; residual adds happen tile-wise into it, matching the XLA decode
  path's numerics (every projection output rounds through bf16).

Supported configs (``supports``): rmsnorm, NeoX split-half RoPE, GQA, SwiGLU,
no biases, no QK-norm, head_dim*num_heads == hidden, tileable dims, cache
length <= 2048 (a layer's K/V slice is held whole in VMEM). Everything else
falls back to the XLA decode path.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32
_BF16 = jnp.bfloat16

#: target bytes per weight-tile DMA — large enough to amortise per-DMA
#: issue/wait overhead (ablation-measured), small enough that the ping-pong
#: pools fit v5e's 128 MB VMEM with room to spare
TILE_TARGET_BYTES = 12 << 20


def _plan(width: int, k_rows: int,
          target_bytes: int = TILE_TARGET_BYTES) -> tuple[int, int] | None:
    """(n_tiles, cols): fewest tiles with cols | width, cols % 128 == 0,
    tile bytes <= target."""
    max_cols = max(128, target_bytes // (k_rows * 2))
    for n in range(1, width // 128 + 1):
        if width % n:
            continue
        cols = width // n
        if cols % 128 == 0 and cols <= max_cols:
            return n, cols
    return None


def plan_tiles(hidden: int, intermediate: int) -> dict | None:
    """Per-projection (n_tiles, cols) plans; None when not tileable."""
    plans = {
        "q": _plan(hidden, hidden), "o": _plan(hidden, hidden),
        "g": _plan(intermediate, hidden), "u": _plan(intermediate, hidden),
        "d": _plan(hidden, intermediate),
    }
    return None if any(v is None for v in plans.values()) else plans


def supports(*, hidden: int, intermediate: int, n_heads: int, n_kv_heads: int,
             head_dim: int, max_seq: int, norm_type: str, activation: str,
             use_rope: bool, has_bias: bool, use_qk_norm: bool,
             is_moe: bool) -> bool:
    """Static eligibility for the fused decode kernel."""
    kv_d = n_kv_heads * head_dim
    return (norm_type == "rmsnorm" and activation == "silu" and use_rope
            and not has_bias and not use_qk_norm and not is_moe
            and n_heads * head_dim == hidden
            and plan_tiles(hidden, intermediate) is not None
            and kv_d % 128 == 0 and kv_d <= hidden
            and head_dim % 2 == 0 and head_dim <= 128
            and max_seq % 128 == 0 and max_seq <= 2048)


def _make_kernel(dims, plans, eps: float, debug: str = ""):
    # debug ablations (PYGPUKIT_FUSED_DEBUG): "dma_only" stubs the math to
    # row copies (streaming ceiling-ish); "no_attn" skips attention;
    # "no_dma" skips all DMA traffic (pure compute chain on stale buffers)
    (L, H, I, HQ, HK, D, MAX) = dims
    KVD = HK * D
    G = HQ // HK
    NQ, CQ = plans["q"]
    NO, CO = plans["o"]
    NG, CG = plans["g"]
    NU, CU = plans["u"]
    ND, CD = plans["d"]
    half = D // 2
    scale = 1.0 / math.sqrt(D)
    DMA_ONLY = debug == "dma_only"
    NO_DMA = debug == "no_dma"
    NO_ATTN = debug in ("no_attn", "no_dma") or DMA_ONLY

    # Flat per-layer A-stream schedule. RING_A slots with LOOKAHEAD starts
    # ahead; the schedule is padded so len % RING_A == 0 (cross-layer
    # lookahead positions land on the same static slots the next layer's
    # own code uses). Measured on the 1B model: 2:1 -> 5.67 ms/tok,
    # 4:2 -> 8.4 (deeper pipelining REGRESSED — VMEM pressure at 4x12MB
    # slots; runs carry ~10-30% tunnel variance). Env-sweepable via
    # PYGPUKIT_FUSED_RING=ring:lookahead for future tuning.
    import os as _os
    _ring = _os.environ.get("PYGPUKIT_FUSED_RING", "2:1").split(":")
    RING_A = int(_ring[0])
    LOOKAHEAD = int(_ring[1]) if len(_ring) > 1 else 1
    A_SCHED = ([("q", t, CQ) for t in range(NQ)]
               + [("k", 0, KVD), ("v", 0, KVD)]
               + [("o", t, CO) for t in range(NO)]
               + [("g", t, CG) for t in range(NG)]
               + [("u", t, CU) for t in range(NU)])
    while len(A_SCHED) % RING_A:
        A_SCHED.append(("nop", 0, 0))
    NA = len(A_SCHED)

    def kernel(pos_ref, h0, cosr, sinr, attn_nw, mlp_nw, final_nw,
               wq, wk, wv, wo, wg, wu, wd, kc, vc,
               h_out, k_new, v_new,
               x_s, qv, attnv, g_s, u_s, act_s, kn_s, qg_s,
               *bufs_and_sems):
        # per-slot SEPARATE VMEM refs: a single [R, H, C] buffer serializes
        # DMA writes to one slot against MXU reads of another (Mosaic hazard
        # tracking is per-buffer — ablation showed compute and DMA fully
        # serialized: no_attn 5.57 ms == compute 2.92 + stream 2.4)
        bufA = bufs_and_sems[:RING_A]
        bufB = bufs_and_sems[RING_A:RING_A + 2]
        kbuf, vbuf = bufs_and_sems[RING_A + 2:RING_A + 4]
        semA = bufs_and_sems[RING_A + 4]
        semB = bufs_and_sems[RING_A + 5]
        semK = bufs_and_sems[RING_A + 6]
        semV = bufs_and_sems[RING_A + 7]

        a_refs = {"q": wq, "o": wo, "g": wg, "u": wu}

        def a_dma(layer, pos):
            """The async copy for A-schedule position ``pos`` of ``layer``."""
            kind, tile, ncols = A_SCHED[pos]
            slot = pos % RING_A
            if kind == "nop" or NO_DMA:
                return None
            if kind in ("k", "v"):
                ref = wk if kind == "k" else wv
                return pltpu.make_async_copy(
                    ref.at[layer], bufA[slot].at[:, 0:KVD], semA.at[slot])
            return pltpu.make_async_copy(
                a_refs[kind].at[layer, tile], bufA[slot].at[:, 0:ncols],
                semA.at[slot])

        def a_start(layer, pos):
            if pos < NA:
                d = a_dma(layer, pos)
                if d is not None:
                    d.start()
            else:
                # next layer's head (same static slot: NA % RING_A == 0)
                if A_SCHED[pos - NA][0] != "nop" and not NO_DMA:
                    @pl.when(layer + 1 < L)
                    def _():
                        a_dma(layer + 1, pos - NA).start()

        def a_wait(layer, pos):
            d = a_dma(layer, pos)
            if d is not None:
                d.wait()

        def dma_b(layer, tile, slot):
            if NO_DMA:
                return None
            return pltpu.make_async_copy(
                wd.at[layer, tile], bufB[slot], semB.at[slot])

        def dma_k(layer):
            return None if NO_DMA else pltpu.make_async_copy(
                kc.at[layer], kbuf, semK)

        def dma_v(layer):
            return None if NO_DMA else pltpu.make_async_copy(
                vc.at[layer], vbuf, semV)

        def rms(v, w):
            vf = v.astype(_F32)
            var = jnp.mean(vf * vf, axis=-1, keepdims=True)
            return (vf * jax.lax.rsqrt(var + eps)
                    * w.astype(_F32)).astype(_BF16)

        def matvec_into(dst, lo, hi, x_vec, slot, ncols):
            if DMA_ONLY:
                dst[0:1, lo:hi] = bufA[slot][0:1, 0:ncols]
            else:
                dst[0:1, lo:hi] = jnp.dot(
                    x_vec, bufA[slot][:, 0:ncols],
                    preferred_element_type=_F32).astype(_BF16)

        # ---------------- prologue -----------------------------------------
        for p0 in range(min(LOOKAHEAD, NA)):
            a_start(0, p0)
        if not NO_DMA:
            dma_k(0).start()
            dma_v(0).start()
        x_s[:] = h0[:].astype(_BF16)

        def layer_body(l, carry):
            # Straight-line unrolled schedule; static slots repeat exactly
            # every layer (NA % RING_A == 0).
            x1 = rms(x_s[:], attn_nw[pl.ds(l, 1), :])
            x2 = None
            kproj = vproj = None

            pos_t = pos_ref[0]
            c = cosr[0:1, 0:half].astype(_F32)
            s = sinr[0:1, 0:half].astype(_F32)

            def rope_pair(vec, off):
                v0 = vec[0:1, off:off + half].astype(_F32)
                v1 = vec[0:1, off + half:off + 2 * half].astype(_F32)
                return ((v0 * c - v1 * s).astype(_BF16),
                        (v1 * c + v0 * s).astype(_BF16))

            def attention(kproj, vproj):
                # static-offset stores into a staging row (Mosaic rejects
                # dynamic stores at unaligned lane offsets), then ONE
                # aligned full-row store at the traced layer index
                for hk_i in range(HK):
                    r0, r1 = rope_pair(kproj, hk_i * D)
                    kn_s[0:1, hk_i * D:hk_i * D + half] = r0.astype(_F32)
                    kn_s[0:1, hk_i * D + half:hk_i * D + 2 * half] = (
                        r1.astype(_F32))
                k_new[pl.ds(l, 1), :] = kn_s[:]
                v_new[pl.ds(l, 1), :] = vproj.astype(_F32)

                kv_mask = (jax.lax.broadcasted_iota(jnp.int32, (1, MAX), 1)
                           < pos_t).astype(_F32)
                neg = (1.0 - kv_mask) * -1e30
                if not NO_DMA:
                    dma_k(l).wait()
                    dma_v(l).wait()

                if NO_ATTN:
                    for t_ in range(NQ):
                        attnv[0:1, t_ * CQ:(t_ + 1) * CQ] = (
                            qv[0:1, t_ * CQ:(t_ + 1) * CQ])
                # Batched per kv-head GROUP: G roped query heads staged into
                # a [G, D] scratch (static row stores); each group is two
                # MXU dots + one masked softmax (the per-head formulation
                # spent the budget on sub-128-lane Mosaic relayouts).
                for hk_i in range(0 if NO_ATTN else HK):
                    for g_i in range(G):
                        r0, r1 = rope_pair(qv, (hk_i * G + g_i) * D)
                        qg_s[g_i:g_i + 1, :] = jnp.concatenate(
                            [r0, r1], axis=1)
                    kh = kbuf[:, hk_i * D:(hk_i + 1) * D]        # [MAX,D]
                    sc = jax.lax.dot_general(
                        qg_s[:], kh, (((1,), (1,)), ((), ())),
                        preferred_element_type=_F32) * scale + neg
                    kn_g = kn_s[0:1, hk_i * D:(hk_i + 1) * D]    # f32
                    # VPU multiply-reduce (a [G,1] MXU dot trips a Mosaic
                    # vector.broadcast verifier error)
                    s_new = jnp.sum(qg_s[:].astype(_F32) * kn_g, axis=-1,
                                    keepdims=True) * scale       # [G,1]
                    m = jnp.maximum(
                        jnp.max(sc, axis=-1, keepdims=True), s_new)
                    pr = jnp.exp(sc - m) * kv_mask
                    p_new = jnp.exp(s_new - m)
                    denom = jnp.sum(pr, axis=-1, keepdims=True) + p_new
                    vh = vbuf[:, hk_i * D:(hk_i + 1) * D].astype(_F32)
                    o = jax.lax.dot_general(
                        pr, vh, (((1,), (0,)), ((), ())),
                        preferred_element_type=_F32,
                        precision=jax.lax.Precision.HIGHEST)     # [G,D]
                    o = o + p_new * vproj[
                        0:1, hk_i * D:(hk_i + 1) * D].astype(_F32)
                    o = (o / denom).astype(_BF16)
                    for g_i in range(G):
                        attnv[0:1, (hk_i * G + g_i) * D:
                              (hk_i * G + g_i + 1) * D] = o[g_i:g_i + 1, :]
                # prefetch next layer's KV while the MLP weights stream
                if not NO_DMA:
                    @pl.when(l + 1 < L)
                    def _():
                        dma_k(l + 1).start()
                        dma_v(l + 1).start()

            for pos in range(NA):
                a_start(l, pos + LOOKAHEAD)
                kind, tile, ncols = A_SCHED[pos]
                slot = pos % RING_A
                if kind == "nop":
                    continue
                a_wait(l, pos)
                if kind == "q":
                    matvec_into(qv, tile * CQ, (tile + 1) * CQ, x1, slot, CQ)
                elif kind == "k":
                    kproj = jnp.dot(x1, bufA[slot][:, 0:KVD],
                                    preferred_element_type=_F32).astype(_BF16)
                elif kind == "v":
                    vproj = jnp.dot(x1, bufA[slot][:, 0:KVD],
                                    preferred_element_type=_F32).astype(_BF16)
                    attention(kproj, vproj)
                    av = attnv[:]
                elif kind == "o":
                    if DMA_ONLY:
                        x_s[0:1, tile * CO:(tile + 1) * CO] = (
                            bufA[slot][0:1, 0:CO])
                    else:
                        delta = jnp.dot(av, bufA[slot][:, 0:CO],
                                        preferred_element_type=_F32
                                        ).astype(_BF16)
                        x_s[0:1, tile * CO:(tile + 1) * CO] = (
                            x_s[0:1, tile * CO:(tile + 1) * CO] + delta)
                elif kind == "g":
                    if x2 is None:
                        x2 = rms(x_s[:], mlp_nw[pl.ds(l, 1), :])
                    matvec_into(g_s, tile * CG, (tile + 1) * CG, x2, slot, CG)
                    if tile == 0 and not NO_DMA:
                        dma_b(l, 0, 0).start()       # B stream head
                elif kind == "u":
                    matvec_into(u_s, tile * CU, (tile + 1) * CU, x2, slot, CU)

            gf = g_s[:].astype(_F32)
            act_s[:] = ((gf / (1.0 + jnp.exp(-gf)))
                        * u_s[:].astype(_F32)).astype(_BF16)

            # ---- wd tiles: x += act @ wd (B stream, 2-slot ring) -----------
            actv = act_s[:]
            for t in range(ND):
                if t + 1 < ND and not NO_DMA:
                    dma_b(l, t + 1, (t + 1) % 2).start()
                if not NO_DMA:
                    dma_b(l, t, t % 2).wait()
                if DMA_ONLY:
                    x_s[0:1, t * CD:(t + 1) * CD] = bufB[t % 2][0:1, :]
                else:
                    delta = jnp.dot(actv, bufB[t % 2][:],
                                    preferred_element_type=_F32).astype(_BF16)
                    x_s[0:1, t * CD:(t + 1) * CD] = (
                        x_s[0:1, t * CD:(t + 1) * CD] + delta)
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
    pos [1] int32; weights PRE-TILED via ``tile_weight`` — wq/wo/wg/wu/wd
    [L, NT, K, C] arenas (each tile one contiguous DMA block); wk/wv remain
    [L, H, KvD]; attn_norm/mlp_norm [L,H] f32; final_norm [1,H] f32; caches
    [L, MAX, Hk*D] bf16 (kv heads flattened). Returns (h_final [1,H] bf16,
    k_new [L,Hk*D] f32, v_new [L,Hk*D] f32) — the caller scatters
    k_new/v_new into the caches at ``pos`` and runs the LM head.
    """
    import os
    ring = int(os.environ.get("PYGPUKIT_FUSED_RING", "2:1").split(":")[0])
    L = wq.shape[0]
    H = wq.shape[2]
    I = wg.shape[1] * wg.shape[3]
    MAX = k_cache.shape[1]
    KVD = n_kv_heads * head_dim
    plans = plan_tiles(H, I)
    dims = (L, H, I, n_heads, n_kv_heads, head_dim, MAX)
    kernel = _make_kernel(dims, plans, float(eps),
                          os.environ.get("PYGPUKIT_FUSED_DEBUG", ""))
    ca = max(plans["q"][1], plans["o"][1], plans["g"][1], plans["u"][1], KVD)
    cd = plans["d"][1]

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
            *[pltpu.VMEM((H, ca), _BF16) for _ in range(ring)],  # bufA slots
            pltpu.VMEM((I, cd), _BF16),           # bufB slot 0
            pltpu.VMEM((I, cd), _BF16),           # bufB slot 1
            pltpu.VMEM((MAX, KVD), _BF16),        # kbuf
            pltpu.VMEM((MAX, KVD), _BF16),        # vbuf
            pltpu.SemaphoreType.DMA((ring,)),     # semA (one per slot)
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
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )
    return fn(pos, h0, cos_p, sin_p, attn_norm, mlp_norm, final_norm,
              wq, wk, wv, wo, wg, wu, wd, k_cache, v_cache)


def tile_weight(w, cols: int):
    """[L, K, N] -> [L, N//cols, K, cols] contiguous tile arena (one DMA
    block per tile; column-sliced row-major layouts DMA as K strided 1-2 KB
    segments at ~1/10 bandwidth)."""
    L, K, N = w.shape
    t = w.reshape(L, K, N // cols, cols).transpose(0, 2, 1, 3)
    # force the copy eagerly so the arena is row-major contiguous in HBM
    return jax.block_until_ready(t + jnp.zeros((), w.dtype))
