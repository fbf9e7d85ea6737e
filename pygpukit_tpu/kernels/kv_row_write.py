"""Pallas batched KV-row writes for the batch-rows serving step.

The batch-rows decode step writes one KV row per slot per layer at
per-slot positions. Expressed as vmapped ``dynamic_update_slice`` (per-slot
``pos_b``), XLA lowers each pool's write to a SERIAL 8-iteration scatter
loop whose per-iteration fixed cost (~4 µs: slice + select + reduce
bookkeeping) is independent of the 512-byte payload — device-traced at
batch-8 MAX=4096 on a 1B model: **two loops (k, v) = 1.46 ms/step, 27% of
the whole bf16 step**; int8 dict pools double it (q + scale leaves = four
loops, 2.9 ms/step — the entire int8-KV regression). The reference never
hits this class of cost: its CUDA kv_cache_update writes rows with one
thread block per slot (native/ops/nn/embedding + kv_cache kernels).

This kernel replaces ALL of a layer's row writes with ONE pallas_call:

- grid (B,); per-slot positions and the layer index ride as scalar
  prefetch, so each program's block index_map lands the DMA window
  directly on its slot's row (the same trick the batched-attention
  kernel's live-chunk clamp uses).
- pools are INPUT+OUTPUT with ``input_output_aliases`` — blocks the grid
  never touches keep their bytes (in-place RMW; without aliasing every
  call would copy the full 738 MB pools).
- the row lands via a read-modify-write BLEND of an 8-row window:
  dynamic sublane stores need provable 8-alignment and int8 selects are
  off Mosaic's legal list, so the window converts to i32/f32, selects on
  an iota==offset mask, and converts back — all ops on the round-3
  legality map.
- int8 dict pools ({"q","s"}, ops/embedding.kv_cache_zeros) also blend
  the bf16 scale row into a (L, 512) scale tile (full-L block: Mosaic
  requires the last-two block dims 8/128-divisible or full).

Merged [B, L, MAX, Hk*D] and unmerged [B, L, MAX, Hk, D] pools are both
supported (unmerged blocks carry (Hk, D) as their last-two full dims).
Rows are written bitwise-identically to the XLA scatter path (same
``to_kv_dtype`` / ``kv_quant_rows`` values), so engines mix freely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.backend import interpret_mode
from ..ops.embedding import kv_quant_rows, to_kv_dtype

_F32 = jnp.float32
_SCALE_W = 512          # scale-tile window (lane dim, 128-multiple)


def _wide(dtype):
    """Blend dtype: integers widen to i32, floats to f32 (Mosaic's legal
    select/convert set; int8/bf16 selects are not on the legality map)."""
    return jnp.int32 if jnp.issubdtype(dtype, jnp.integer) else _F32


def _row_of(tile, b):
    """Row ``b`` of a [B, ...] VMEM tile via masked reduction (dynamic
    sublane indexing must be provably 8-aligned). Twin of
    batch_decode_attention._select_row (f32-only variant) — a Mosaic
    legality fix to either must be mirrored in the other."""
    w = _wide(tile.dtype)
    sel = jax.lax.broadcasted_iota(
        jnp.int32, tile.shape, 0) == b
    return jnp.sum(jnp.where(sel, tile.astype(w), 0), axis=0,
                   keepdims=True)                       # [1, ...] widened


def _blend_row(old, new_row_w, off):
    """Write widened ``new_row_w`` [1, ...] into sublane ``off`` of
    ``old`` [8, ...] (same trailing dims), returning old.dtype."""
    w = _wide(old.dtype)
    pred = jax.lax.broadcasted_iota(jnp.int32, old.shape, 0) == off
    out = jnp.where(pred, jnp.broadcast_to(new_row_w, old.shape)
                    .astype(w), old.astype(w))
    return out.astype(old.dtype)


def _krw_kernel(layer_ref, poss_ref, ksc_ref, vsc_ref, k_new_ref, v_new_ref,
                kq_in, vq_in, *rest, int8: bool, scale_w: int = _SCALE_W):
    if int8:
        ks_in, vs_in, kq_out, vq_out, ks_out, vs_out = rest
    else:
        kq_out, vq_out = rest
    b = pl.program_id(0)
    lyr = layer_ref[0]
    pos = poss_ref[b]
    off = pos % 8

    def rmw(win_in, win_out, new_tile):
        old = win_in[0, 0]                              # [8, ...]
        row = _row_of(new_tile[...], b)
        win_out[0, 0] = _blend_row(old, row, off)

    rmw(kq_in, kq_out, k_new_ref)
    rmw(vq_in, vq_out, v_new_ref)
    if int8:
        # scale tiles [1, L, W] bf16: blend the (lyr, pos % W) element
        woff = pos % scale_w

        def rmw_scale(s_in, s_out, val):
            old = s_in[0].astype(_F32)                  # [L, W]
            pred = ((jax.lax.broadcasted_iota(jnp.int32, old.shape, 0)
                     == lyr)
                    & (jax.lax.broadcasted_iota(jnp.int32, old.shape, 1)
                       == woff))
            s_out[0] = jnp.where(pred, val, old).astype(s_out.dtype)

        rmw_scale(ks_in, ks_out, ksc_ref[b])
        rmw_scale(vs_in, vs_out, vsc_ref[b])


def kv_rows_write(k_pool, v_pool, k_new, v_new, layer, poss):
    """Write per-slot KV rows [B, Hk, D] into layer ``layer`` of the dense
    batch pools at positions ``poss`` [B], one pallas_call for every pool
    leaf. Returns the updated pools (RMW-aliased in place).

    Pools: merged [B, L, MAX, Hk*D] / unmerged [B, L, MAX, Hk, D], plain
    (bf16/f32/fp8) or int8 dicts. Values match the XLA scatter path
    bitwise (same to_kv_dtype / kv_quant_rows)."""
    int8 = isinstance(k_pool, dict)
    bsz = k_new.shape[0]
    hk, d = k_new.shape[-2], k_new.shape[-1]
    ks = vs = None
    if int8:
        k_pool, ks = k_pool["q"], k_pool["s"]
        v_pool, vs = v_pool["q"], v_pool["s"]
        kq, ksc = kv_quant_rows(k_new, 2)               # [B,Hk,D], [B]
        vq, vsc = kv_quant_rows(v_new, 2)
        ksc = ksc.astype(_F32)
        vsc = vsc.astype(_F32)
    else:
        kq = to_kv_dtype(k_new, k_pool.dtype)
        vq = to_kv_dtype(v_new, v_pool.dtype)
        ksc = vsc = jnp.zeros((bsz,), _F32)
    merged = k_pool.ndim == 4
    if merged:
        kq = kq.reshape(bsz, hk * d)
        vq = vq.reshape(bsz, hk * d)
        qblk = (1, 1, 8, hk * d)
        newblk = (bsz, hk * d)

        def _win(b, lyr, ps, ksc, vsc):
            return (b, lyr[0], ps[b] // 8, 0)
    else:
        qblk = (1, 1, 8, hk, d)
        newblk = (bsz, hk, d)

        def _win(b, lyr, ps, ksc, vsc):
            return (b, lyr[0], ps[b] // 8, 0, 0)

    def _new_map(b, lyr, ps, ksc, vsc):
        return (0,) * len(newblk)

    n_layers = k_pool.shape[1]
    in_specs = [pl.BlockSpec(newblk, _new_map),
                pl.BlockSpec(newblk, _new_map),
                pl.BlockSpec(qblk, _win),
                pl.BlockSpec(qblk, _win)]
    operands = [kq, vq, k_pool, v_pool]
    out_specs = [pl.BlockSpec(qblk, _win), pl.BlockSpec(qblk, _win)]
    out_shapes = [jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
                  jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype)]
    # aliases index the FULL input list (4 prefetch args first)
    aliases = {6: 0, 7: 1}
    sw = _SCALE_W
    if int8:
        # scale arrays are [B, L, MAX]; the 512-lane window assumes
        # MAX % 512 == 0 (engines use power-of-two MAX >= 512). Any other
        # MAX rides a FULL-width block instead — "equal to the array dim"
        # is always on Mosaic's legality map, and a partial 512 window at
        # the tail would clamp out of bounds and land the blend on the
        # wrong column.
        if ks.shape[2] % _SCALE_W != 0:
            sw = ks.shape[2]
        sblk = (1, n_layers, sw)

        def _swin(b, lyr, ps, ksc, vsc):
            return (b, 0, ps[b] // sw)

        in_specs += [pl.BlockSpec(sblk, _swin), pl.BlockSpec(sblk, _swin)]
        operands += [ks, vs]
        out_specs += [pl.BlockSpec(sblk, _swin), pl.BlockSpec(sblk, _swin)]
        out_shapes += [jax.ShapeDtypeStruct(ks.shape, ks.dtype),
                       jax.ShapeDtypeStruct(vs.shape, vs.dtype)]
        aliases = {6: 0, 7: 1, 8: 2, 9: 3}

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,          # layer, poss, kscale, vscale
        grid=(bsz,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[],
    )
    out = pl.pallas_call(
        functools.partial(_krw_kernel, int8=int8, scale_w=sw),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret_mode(),
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      jnp.asarray(poss, jnp.int32), ksc, vsc, *operands)
    if int8:
        kqo, vqo, kso, vso = out
        return {"q": kqo, "s": kso}, {"q": vqo, "s": vso}
    return out[0], out[1]
