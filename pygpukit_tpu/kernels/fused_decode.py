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

#: target bytes per weight-tile DMA — a Mosaic dot carries a ~13 us fixed
#: cost and only approaches VMEM-stream-bound (~740 GB/s) near ~23 MB
#: operands (microbench, docs/performance.md), so tiles are as LARGE as the
#: ping-pong pools allow within v5e's 128 MB VMEM
TILE_TARGET_BYTES = 24 << 20


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


def plan_tiles(hidden: int, intermediate: int,
               kv_d: int = 0) -> dict | None:
    """Per-projection (n_tiles, cols) plans over the CONSOLIDATED weights
    (q|k|v fused, gate|up fused — every dot pays ~13 us of fixed cost, so
    the kernel runs as few, as large dots as VMEM allows); None when not
    tileable."""
    plans = {
        "qkv": _plan(hidden + 2 * kv_d, hidden),
        "o": _plan(hidden, hidden),
        "gu": _plan(2 * intermediate, hidden),
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
            and plan_tiles(hidden, intermediate, kv_d) is not None
            and kv_d % 128 == 0 and kv_d <= hidden
            and intermediate % 128 == 0
            and head_dim % 2 == 0 and head_dim <= 128
            and max_seq % 128 == 0 and max_seq <= 2048)


def _make_kernel(dims, plans, eps: float, debug: str = ""):
    # debug ablations (PYGPUKIT_FUSED_DEBUG): "dma_only" stubs the math to
    # row copies (streaming ceiling-ish); "no_attn" skips attention;
    # "no_dma" skips all DMA traffic (pure compute chain on stale buffers)
    (L, H, I, HQ, HK, D, MAX) = dims
    KVD = HK * D
    G = HQ // HK
    NQKV, CQKV = plans["qkv"]
    NO, CO = plans["o"]
    NGU, CGU = plans["gu"]
    ND, CD = plans["d"]
    half = D // 2
    scale = 1.0 / math.sqrt(D)
    DMA_ONLY = debug == "dma_only"
    NO_DMA = debug == "no_dma"
    NO_ATTN = debug in ("no_attn", "no_dma") or DMA_ONLY

    # Flat per-layer A-stream schedule over the CONSOLIDATED projections
    # (microbench: every Mosaic dot costs ~13 us fixed regardless of M and
    # only ~31-42 us even at 23-46 MB operands — ten dots/layer spent
    # ~2.9 ms/tok on dot overhead alone, so q|k|v and gate|up are fused
    # column-wise into single dots; 5 dots/layer on the 1B model).
    # RING_A slots with LOOKAHEAD starts ahead; the schedule is padded so
    # len % RING_A == 0 (cross-layer lookahead positions land on the same
    # static slots the next layer's own code uses). Env-sweepable via
    # PYGPUKIT_FUSED_RING=ring:lookahead.
    import os as _os
    _ring = _os.environ.get("PYGPUKIT_FUSED_RING", "2:1").split(":")
    RING_A = int(_ring[0])
    LOOKAHEAD = int(_ring[1]) if len(_ring) > 1 else 1
    # each tile is issued as SPLIT parallel row-range DMAs on separate
    # semaphores — a single async copy is capped by one DMA engine
    # (dma_only ablation streamed at ~290 GB/s vs ~800 peak)
    SPLIT = int(_os.environ.get("PYGPUKIT_FUSED_DMA_SPLIT", "2"))
    while H % (SPLIT * 8) or I % (SPLIT * 8):   # keep row chunks sublane-whole
        SPLIT -= 1
    A_SCHED = ([("qkv", t, CQKV) for t in range(NQKV)]
               + [("o", t, CO) for t in range(NO)]
               + [("gu", t, CGU) for t in range(NGU)])
    while len(A_SCHED) % RING_A:
        A_SCHED.append(("nop", 0, 0))
    NA = len(A_SCHED)

    def kernel(pos_ref, h0, cosr, sinr, attn_nw, mlp_nw, final_nw,
               wqkv, wo, wgu, wd, kc, vc,
               h_out, k_new, v_new,
               x_s, qkv_s, attnv, gu_s, act_s, kn_s, qg_s,
               *bufs_and_sems):
        # per-slot SEPARATE VMEM refs: a single [R, H, C] buffer serializes
        # DMA writes to one slot against MXU reads of another (Mosaic hazard
        # tracking is per-buffer — ablation showed compute and DMA fully
        # serialized: no_attn 5.57 ms == compute 2.92 + stream 2.4)
        # ... and SEPARATE per-slot scalar semaphores for the same reason —
        # a shared (ring,) semaphore ARRAY is one buffer to the hazard
        # tracker and serializes the slots it guards
        bufA = bufs_and_sems[:RING_A]
        bufB = bufs_and_sems[RING_A:RING_A + 2]
        kbuf, vbuf = bufs_and_sems[RING_A + 2:RING_A + 4]
        na = RING_A + 4
        semA = bufs_and_sems[na:na + RING_A * SPLIT]
        semB = bufs_and_sems[na + RING_A * SPLIT:
                             na + (RING_A + 2) * SPLIT]
        semK = bufs_and_sems[na + (RING_A + 2) * SPLIT]
        semV = bufs_and_sems[na + (RING_A + 2) * SPLIT + 1]

        a_refs = {"qkv": wqkv, "o": wo, "gu": wgu}

        def a_dma(layer, pos):
            """The SPLIT parallel row-range copies for A-schedule position
            ``pos`` of ``layer`` (each on its own engine + semaphore)."""
            kind, tile, ncols = A_SCHED[pos]
            slot = pos % RING_A
            if kind == "nop" or NO_DMA:
                return []
            rows = H // SPLIT
            return [pltpu.make_async_copy(
                a_refs[kind].at[layer, tile,
                                pl.ds(i * rows, rows)],
                bufA[slot].at[pl.ds(i * rows, rows), 0:ncols],
                semA[slot * SPLIT + i]) for i in range(SPLIT)]

        def a_start(layer, pos):
            if pos < NA:
                for d in a_dma(layer, pos):
                    d.start()
            else:
                # next layer's head (same static slot: NA % RING_A == 0)
                if A_SCHED[pos - NA][0] != "nop" and not NO_DMA:
                    @pl.when(layer + 1 < L)
                    def _():
                        for d in a_dma(layer + 1, pos - NA):
                            d.start()

        def a_wait(layer, pos):
            for d in a_dma(layer, pos):
                d.wait()

        def dma_b(layer, tile, slot):
            if NO_DMA:
                return []
            rows = I // SPLIT
            return [pltpu.make_async_copy(
                wd.at[layer, tile, pl.ds(i * rows, rows)],
                bufB[slot].at[pl.ds(i * rows, rows), :],
                semB[slot * SPLIT + i]) for i in range(SPLIT)]

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
                    attnv[0:1, :] = qkv_s[0:1, 0:H]
                # Batched per kv-head GROUP: G roped query heads staged into
                # a [G, D] scratch (static row stores); each group is two
                # MXU dots + one masked softmax (the per-head formulation
                # spent the budget on sub-128-lane Mosaic relayouts).
                for hk_i in range(0 if NO_ATTN else HK):
                    for g_i in range(G):
                        r0, r1 = rope_pair(qkv_s, (hk_i * G + g_i) * D)
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
                if kind == "qkv":
                    # one dot produces q|k|v columns into qkv_s [1, H+2KvD]
                    matvec_into(qkv_s, tile * CQKV, (tile + 1) * CQKV,
                                x1, slot, CQKV)
                    if tile == NQKV - 1:
                        kproj = qkv_s[0:1, H:H + KVD]
                        vproj = qkv_s[0:1, H + KVD:H + 2 * KVD]
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
                elif kind == "gu":
                    # one dot produces gate|up columns into gu_s [1, 2I]
                    # (tiles may straddle the gate/up boundary; the
                    # activation below reads the halves regardless)
                    if x2 is None:
                        x2 = rms(x_s[:], mlp_nw[pl.ds(l, 1), :])
                    matvec_into(gu_s, tile * CGU, (tile + 1) * CGU,
                                x2, slot, CGU)
                    if tile == 0 and not NO_DMA:
                        for d_ in dma_b(l, 0, 0):    # B stream head
                            d_.start()

            gf = gu_s[0:1, 0:I].astype(_F32)
            act_s[:] = ((gf / (1.0 + jnp.exp(-gf)))
                        * gu_s[0:1, I:2 * I].astype(_F32)).astype(_BF16)

            # ---- wd tiles: x += act @ wd (B stream, 2-slot ring) -----------
            actv = act_s[:]
            for t in range(ND):
                if t + 1 < ND and not NO_DMA:
                    for d_ in dma_b(l, t + 1, (t + 1) % 2):
                        d_.start()
                if not NO_DMA:
                    for d_ in dma_b(l, t, t % 2):
                        d_.wait()
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


def fused_decode_step(h0, cos_p, sin_p, pos, wqkv, wo, wgu, wd,
                      attn_norm, mlp_norm, final_norm, k_cache, v_cache,
                      *, n_heads: int, n_kv_heads: int, head_dim: int,
                      eps: float = 1e-5, interpret: bool = False):
    """Run the fused decode step.

    h0 [1,H] bf16 (embedded token); cos_p/sin_p [1,D] f32 (RoPE row at pos);
    pos [1] int32; weights PRE-TILED via ``tile_weight`` over the
    CONSOLIDATED projections — wqkv (q|k|v fused), wo, wgu (gate|up fused),
    wd as [L, NT, K, C] arenas (each tile one contiguous DMA block);
    attn_norm/mlp_norm [L,H] f32; final_norm [1,H] f32; caches
    [L, MAX, Hk*D] bf16 (kv heads flattened). Returns (h_final [1,H] bf16,
    k_new [L,Hk*D] f32, v_new [L,Hk*D] f32) — the caller scatters
    k_new/v_new into the caches at ``pos`` and runs the LM head.
    """
    import os
    ring = int(os.environ.get("PYGPUKIT_FUSED_RING", "2:1").split(":")[0])
    split = int(os.environ.get("PYGPUKIT_FUSED_DMA_SPLIT", "2"))
    L = wqkv.shape[0]
    H = wqkv.shape[2]
    I = wgu.shape[1] * wgu.shape[3] // 2
    while H % (split * 8) or I % (split * 8):   # mirror _make_kernel clamp
        split -= 1
    MAX = k_cache.shape[1]
    KVD = n_kv_heads * head_dim
    plans = plan_tiles(H, I, KVD)
    dims = (L, H, I, n_heads, n_kv_heads, head_dim, MAX)
    kernel = _make_kernel(dims, plans, float(eps),
                          os.environ.get("PYGPUKIT_FUSED_DEBUG", ""))
    ca = max(plans["qkv"][1], plans["o"][1], plans["gu"][1])
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
                  aspec, aspec, aspec, aspec, aspec, aspec],
        out_specs=(vspec, vspec, vspec),
        scratch_shapes=[
            pltpu.VMEM((1, H), _BF16),            # x_s
            pltpu.VMEM((1, H + 2 * KVD), _BF16),  # qkv_s (HqD == H)
            pltpu.VMEM((1, H), _BF16),            # attnv
            pltpu.VMEM((1, 2 * I), _BF16),        # gu_s
            pltpu.VMEM((1, I), _BF16),            # act_s
            pltpu.VMEM((1, KVD), _F32),           # kn_s (staging row)
            pltpu.VMEM((n_heads // n_kv_heads, head_dim), _BF16),  # qg_s
            *[pltpu.VMEM((H, ca), _BF16) for _ in range(ring)],  # bufA slots
            pltpu.VMEM((I, cd), _BF16),           # bufB slot 0
            pltpu.VMEM((I, cd), _BF16),           # bufB slot 1
            pltpu.VMEM((MAX, KVD), _BF16),        # kbuf
            pltpu.VMEM((MAX, KVD), _BF16),        # vbuf
            *[pltpu.SemaphoreType.DMA(())        # semA: ring x split
              for _ in range(ring * split)],
            *[pltpu.SemaphoreType.DMA(())        # semB: 2 x split
              for _ in range(2 * split)],
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
              wqkv, wo, wgu, wd, k_cache, v_cache)


def tile_weight(w, cols: int):
    """[L, K, N] -> [L, N//cols, K, cols] contiguous tile arena (one DMA
    block per tile; column-sliced row-major layouts DMA as K strided 1-2 KB
    segments at ~1/10 bandwidth)."""
    L, K, N = w.shape
    t = w.reshape(L, K, N // cols, cols).transpose(0, 2, 1, 3)
    # force the copy eagerly so the arena is row-major contiguous in HBM
    return jax.block_until_ready(t + jnp.zeros((), w.dtype))
