"""Pallas quantized GEMV kernels (decode M=1).

TPU-native replacement for the reference's bandwidth-optimised GEMV family
(reference: native/ops/matmul/gemv/** — bf16 at 98-101% of HBM peak, w8a16
fp8-weight kernels with 6-22x speedups). The kernel streams weight tiles
HBM→VMEM (Mosaic double-buffers the grid pipeline automatically), upcasts
fp8/int8 in-register, and accumulates f32 partial dots; bandwidth is the
roofline, so the win over bf16 is the storage dtype.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.backend import interpret_mode

_F32 = jnp.float32

#: Scoped-VMEM limit for every GEMV pallas_call: the 2-3 MB adaptive tiles
#: overflow the 16 MB default (unpacked bf16 + expanded f32 scales are
#: 4-8x the packed tile); v5e has 128 MB VMEM (CLAUDE.md).
_VMEM_LIMIT = 100 * 2**20


def _cdiv(a, b):
    return -(-a // b)


def _gemv_kernel(w_ref, x_ref, scale_ref, o_ref, acc_ref, *, n_k: int,
                 out_rows: int):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:].astype(jnp.bfloat16)           # [bn, bk] upcast in-register
    x = x_ref[:].astype(jnp.bfloat16)           # [rows, bk]
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=_F32)

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * scale_ref[:].astype(_F32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn", "bk", "interpret"))
def _gemv_pallas(w, x, scale, *, bn: int, bk: int, interpret: bool):
    n, k = w.shape
    rows = x.shape[0]
    n_k = _cdiv(k, bk)
    kernel = functools.partial(_gemv_kernel, n_k=n_k, out_rows=rows)
    return pl.pallas_call(
        kernel,
        grid=(_cdiv(n, bn), n_k),
        in_specs=[
            pl.BlockSpec((bn, bk), lambda ni, ki: (ni, ki)),
            pl.BlockSpec((rows, bk), lambda ni, ki: (0, ki)),
            pl.BlockSpec((1, bn), lambda ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((rows, bn), lambda ni, ki: (0, ni)),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((rows, bn), _F32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k,
            bytes_accessed=n * k * w.dtype.itemsize + k * 2 + n * 2,
            transcendentals=0),
        interpret=interpret,
    )(w, x, scale)


@functools.partial(jax.jit, static_argnames=("bn", "bk"))
def gemv_quant(w_q, x, scale=None, bn: int = 1024, bk: int = 1024):
    """y[N] = W[N,K] @ x[K] with quantized weight storage.

    w_q: fp8/int8/bf16 [N, K]; x: bf16/f32 [K]; scale: per-output-column
    f32 [N] (or None for 1.0). Returns bf16 [N].
    """
    n, k = w_q.shape
    bn = min(bn, n)
    bk = min(bk, k)
    npad = _cdiv(n, bn) * bn - n
    kpad = _cdiv(k, bk) * bk - k
    if npad or kpad:
        w_q = jnp.pad(w_q, ((0, npad), (0, kpad)))
    xr = x.reshape(1, -1).astype(jnp.bfloat16)
    xr = jnp.pad(xr, ((0, 7), (0, kpad)))       # sublane min 8 rows
    if scale is None:
        scale = jnp.ones((n,), _F32)
    sc = jnp.pad(scale.reshape(1, -1).astype(_F32), ((0, 0), (0, npad)))
    out = _gemv_pallas(w_q, xr, sc, bn=bn, bk=bk,
                       interpret=interpret_mode())
    return out[0, :n]


def _unpack_nibbles_bf16(p):
    """[*, bk] uint8 -> (lo, hi16) bf16: lo is the signed low nibble, hi16
    the signed high nibble TIMES 16 (callers fold the 1/16 into the other
    dot operand — a free power-of-2 exponent shift in bf16/f32).

    8-bit-native unpack (measured +63% GEMV stream vs the old int32-shift
    path, 347 -> 566 GB/s packed): Mosaic legalizes AND/XOR/bitcast/convert
    at 8 bit but NOT sub/mul/shift (arith.subi/muli/shli fail) or bf16
    compares — so the low nibble sign-extends via XOR-bias
    ((u ^ 8) - 8 in bf16) and the high nibble via bitcast reinterpretation
    (int8(p & 0xF0) IS the signed high nibble * 16)."""
    lo = (((p & 0x0F) ^ 0x08).astype(jnp.int8).astype(jnp.bfloat16)
          - jnp.bfloat16(8.0))
    hi16 = jax.lax.bitcast_convert_type(p & 0xF0, jnp.int8) \
        .astype(jnp.bfloat16)
    return lo, hi16


def _packed_tile_dots(p, xlo, xhi):
    """Shared packed-int4 (w4a16) tile math for the sliced AND stacked
    kernels: in-register nibble unpack + two bf16 MXU dots, the exact 1/16
    for the high nibble folded into x_hi. Keeping one body is what
    preserves the sliced/stacked bitwise-identity invariant the interpret
    tests assert."""
    lo, hi16 = _unpack_nibbles_bf16(p)
    xl = xlo.astype(jnp.bfloat16)
    xh = xhi.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 16.0)
    return (jax.lax.dot_general(xl, lo, (((1,), (1,)), ((), ())),
                                preferred_element_type=_F32)
            + jax.lax.dot_general(xh, hi16, (((1,), (1,)), ((), ())),
                                  preferred_element_type=_F32))


def _gemv_packed_kernel(w_ref, xlo_ref, xhi_ref, scale_ref, o_ref, acc_ref,
                        *, n_k: int):
    """Packed-int4 GEMV: w tile [bn, bk_half] uint8, nibbles unpacked to bf16
    in-register (the reference's int4 GEMV trick, gemv/int4*). Split-half
    layout: low nibble pairs with x[:, :K/2], high with x[:, K/2:] — two
    dots, no sub-32-bit interleave."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += _packed_tile_dots(w_ref[:], xlo_ref[:], xhi_ref[:])

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * scale_ref[:].astype(_F32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn", "bk_half", "interpret"))
def _gemv_packed_pallas(w_packed, x_lo, x_hi, scale, *, bn: int,
                        bk_half: int, interpret: bool):
    n, k_half = w_packed.shape
    rows = x_lo.shape[0]
    n_k = _cdiv(k_half, bk_half)
    kernel = functools.partial(_gemv_packed_kernel, n_k=n_k)
    return pl.pallas_call(
        kernel,
        grid=(_cdiv(n, bn), n_k),
        in_specs=[
            pl.BlockSpec((bn, bk_half), lambda ni, ki: (ni, ki)),
            pl.BlockSpec((rows, bk_half), lambda ni, ki: (0, ki)),
            pl.BlockSpec((rows, bk_half), lambda ni, ki: (0, ki)),
            pl.BlockSpec((1, bn), lambda ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((rows, bn), lambda ni, ki: (0, ni)),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((rows, bn), _F32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k_half * 2,
            bytes_accessed=n * k_half + k_half * 2 * 2 + n * 2,
            transcendentals=0),
        interpret=interpret,
    )(w_packed, x_lo, x_hi, scale)


def _gemv_packed_stacked_kernel(idx_ref, w_ref, xlo_ref, xhi_ref, scale_ref,
                                o_ref, acc_ref, *, n_k: int):
    """Stacked-layer packed-int4 GEMV: same math as _gemv_packed_kernel,
    but the weight operand is the WHOLE [L, N, K/2] stack and the layer is
    selected by the scalar-prefetch index_maps. Rationale: a Pallas operand
    cannot absorb a dynamic layer slice the way XLA dots do — the sliced
    form materializes a full copy of every projection every decode step
    (device-traced at 761 us of the 1B int4 decode's 1.94 ms/tok)."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += _packed_tile_dots(w_ref[0], xlo_ref[:], xhi_ref[:])

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:]
                    * scale_ref[0].astype(_F32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn", "bk_half", "interpret"))
def _gemv_packed_stacked_pallas(w_stack, idx, x_lo, x_hi, scale_stack, *,
                                bn: int, bk_half: int, interpret: bool):
    n_layers, n, k_half = w_stack.shape
    rows = x_lo.shape[0]
    n_k = _cdiv(k_half, bk_half)
    kernel = functools.partial(_gemv_packed_stacked_kernel, n_k=n_k)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(_cdiv(n, bn), n_k),
            in_specs=[
                pl.BlockSpec((1, bn, bk_half),
                             lambda ni, ki, idx: (idx[0], ni, ki)),
                pl.BlockSpec((rows, bk_half), lambda ni, ki, idx: (0, ki)),
                pl.BlockSpec((rows, bk_half), lambda ni, ki, idx: (0, ki)),
                pl.BlockSpec((1, 1, bn), lambda ni, ki, idx: (idx[0], 0, ni)),
            ],
            out_specs=pl.BlockSpec((rows, bn), lambda ni, ki, idx: (0, ni)),
            scratch_shapes=[pltpu.VMEM((rows, bn), _F32)],
        ),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k_half * 2,
            bytes_accessed=n * k_half + k_half * 2 * 2 + n * 2,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(idx, jnp.int32).reshape(1), w_stack, x_lo, x_hi,
      scale_stack)


def gemv_int4_packed_stacked(w_stack, idx, x, scale_stack,
                             bn: int | None = None,
                             bk_half: int | None = None):
    """y[rows, N] for layer ``idx`` of a stacked packed-int4 weight
    [L, N, K/2] with stacked per-column scales [L, 1, N] — zero weight
    copies (the layer tile is DMA'd straight from the stack via
    scalar-prefetch index maps).

    Requires exact tiling (no N/K padding — padding a stack per call would
    reintroduce the copy this kernel exists to avoid); callers gate on
    ``stacked_tiles_exact`` and fall back to the sliced form otherwise."""
    n_layers, n, k_half = w_stack.shape
    abn, abk = _tiles_for(n, k_half)
    bn = abn if bn is None else min(bn, n)
    bk_half = abk if bk_half is None else min(bk_half, k_half)
    if n % bn or k_half % bk_half:
        raise ValueError(
            f"stacked int4 GEMV needs exact tiling: N={n} bn={bn}, "
            f"K/2={k_half} bk_half={bk_half}")
    rows = x.shape[0] if x.ndim == 2 else 1
    xr = x.reshape(rows, -1).astype(jnp.bfloat16)
    rpad = max(8 - rows, 0)
    x_lo = jnp.pad(xr[:, :k_half], ((0, rpad), (0, 0)))
    x_hi = jnp.pad(xr[:, k_half:k_half * 2], ((0, rpad), (0, 0)))
    sc = scale_stack.reshape(n_layers, 1, n).astype(_F32)
    out = _gemv_packed_stacked_pallas(w_stack, idx, x_lo, x_hi, sc, bn=bn,
                                      bk_half=bk_half,
                                      interpret=interpret_mode())
    return out[:max(rows, 1), :n][:rows]


def stacked_tiles_exact(n: int, k_half: int) -> bool:
    """True when the adaptive tiles divide [N, K/2] exactly (the stacked
    per-column GEMV's no-padding precondition)."""
    bn, bk_half = _tiles_for(n, k_half)
    return n % bn == 0 and k_half % bk_half == 0


def stacked_tiles_exact_km(k_half: int, n: int, blk: int) -> bool:
    """True when the K-major block kernel's adaptive tiles divide [K/2, N]
    exactly AND the scale tiles stay sublane-aligned (8 | nb, so the hi
    scale rows at block offset n_k + ki land on 8-row boundaries)."""
    if blk > k_half or k_half % blk:
        return False
    bn, bk_half = _adaptive_tiles_km(k_half, n, blk)
    nb = bk_half // blk
    return (n % bn == 0 and k_half % bk_half == 0
            and bk_half % blk == 0 and nb % 8 == 0)


def block_tiles_aligned(k_half: int, n: int, blk: int) -> bool:
    """True when the K-major block kernel's chosen tiles keep the scale
    sublane offsets 8-aligned (the sliced path pads, so exact tiling is
    not required — only alignment)."""
    if blk > k_half or k_half % blk:
        return False
    bn, bk_half = _adaptive_tiles_km(k_half, n, blk)
    return bk_half % blk == 0 and (bk_half // blk) % 8 == 0


def _adaptive_tiles_km(k_half: int, n: int, blk: int):
    """Tile choice for the K-major block GEMV: K/2 on sublanes (multiples
    of max(blk, 8*blk) so scale tiles stay aligned), N on lanes (multiples
    of 128), targeting ~2-6 MB packed tiles. The 1B fused shapes all get
    whole-K tiles (K/2 = 1024 or 2816), which also makes most projections
    single-K-step — fewer accumulator round-trips than the N-major form.

    w4a8 MXU caveat (the round-4 lever): the Z-decomposition's total MXU
    work is proportional to bk_half (each tile's dot runs M = nb*rows =
    (bk_half/blk)*rows), so the MINIMUM legal tile bk_half = 8*blk
    minimizes int8 MXU time for every projection — the down proj at
    whole-K nb=88 paid ~10 us/layer of MXU vs ~1 at nb=8, and switching
    it alone measured 496 -> 573 tok/s on the 1B decode
    (scripts/micro_block_v4.py). K-split granularity itself is a wash on
    the real decode (micro_int4_tile_ab), so the min tile is the default
    whenever it divides K/2; TILE_OVERRIDES_KM, keyed (k_half, n), is the
    per-shape hook."""
    ov = TILE_OVERRIDES_KM.get((k_half, n))
    if ov:
        return ov
    step = 8 * blk                               # 8 | nb => aligned scales
    bk_half = 0
    if step <= k_half and k_half % blk == 0 and k_half % step == 0:
        bk_half = step
    if not bk_half:                              # sliced path pads instead
        bk_half = min(k_half, max(blk, (1024 // blk) * blk))
    n_tiles = _cdiv(n, 2816)
    bn = min(_cdiv(_cdiv(n, n_tiles), 128) * 128, n)
    return max(bn, min(n, 128)), bk_half


def _adaptive_tiles(n: int, k_half: int):
    """Tile choice for the packed GEMVs: ~2-3 MB packed tiles with minimal
    N padding (multiples of 128 for the lane-dim out tile). Measured on the
    277 MB honest-stream harness: bn 2048-2816 x bk_half 1024-1408 runs
    ~600 GB/s packed vs 393 at the old 512x512 (and 540 at 4096)."""
    n_tiles = _cdiv(n, 2816)
    bn = min(_cdiv(_cdiv(n, n_tiles), 128) * 128, n)
    k_tiles = _cdiv(k_half, 1408)
    bk_half = min(_cdiv(_cdiv(k_half, k_tiles), 128) * 128, k_half)
    return max(bn, min(n, 128)), max(bk_half, min(k_half, 128))


#: Per-shape tile overrides for the packed/w4a8 GEMVs, keyed (N, K/2).
#: Rationale (scripts/micro_int4_tiles.py): _adaptive_tiles gives the small
#: per-layer decode projections single-tile grids — grid=(1,1) means Mosaic
#: has NOTHING to double-buffer, so the tile DMA fully serialises against
#: the unpack+dot (ramp exposure). Splitting K restores the revolving-buffer
#: overlap. Entries are set from real-decode A/B measurements, not the
#: micro alone (the micro's qkv/o/down stacks fit in VMEM and can go
#: resident, which hides the DMA ramp the real loop pays).
TILE_OVERRIDES: dict[tuple[int, int], tuple[int, int]] = {}

#: Per-shape (bn, bk_half) overrides for the K-major block GEMVs, keyed
#: (K/2, N) — see _adaptive_tiles_km's K-split caveat. Entries must keep
#: blk | bk_half, 8 | bk_half/blk, and exact division of the shape.
TILE_OVERRIDES_KM: dict[tuple[int, int], tuple[int, int]] = {}


def _tiles_for(n: int, k_half: int):
    ov = TILE_OVERRIDES.get((n, k_half))
    if ov is not None and n % ov[0] == 0 and k_half % ov[1] == 0:
        return ov
    return _adaptive_tiles(n, k_half)


@functools.partial(jax.jit, static_argnames=("bn", "bk_half"))
def gemv_int4_packed(w_packed, x, scale=None, bn: int | None = None,
                     bk_half: int | None = None):
    """y[rows,N] = x[rows,K] @ unpack(W_packed[N, K/2]).T with per-column
    scales. Split-half packing: low nibble = W[:, :K/2], high = W[:, K/2:]
    (matches llm/quant.quantize_weight int4 layout transposed to [N, K/2])."""
    n, k_half = w_packed.shape
    abn, abk = _tiles_for(n, k_half)
    bn = abn if bn is None else min(bn, n)
    bk_half = abk if bk_half is None else min(bk_half, k_half)
    npad = _cdiv(n, bn) * bn - n
    kpad_half = _cdiv(k_half, bk_half) * bk_half - k_half
    if npad or kpad_half:
        w_packed = jnp.pad(w_packed, ((0, npad), (0, kpad_half)))
    rows = x.shape[0] if x.ndim == 2 else 1
    xr = x.reshape(rows, -1).astype(jnp.bfloat16)
    if xr.shape[-1] < 2 * k_half:   # weight pack-padded an odd in-dim
        xr = jnp.pad(xr, ((0, 0), (0, 2 * k_half - xr.shape[-1])))
    rpad = max(8 - rows, 0)
    x_lo = jnp.pad(xr[:, :k_half], ((0, rpad), (0, kpad_half)))
    x_hi = jnp.pad(xr[:, k_half:k_half * 2], ((0, rpad), (0, kpad_half)))
    if scale is None:
        scale = jnp.ones((n,), _F32)
    sc = jnp.pad(scale.reshape(1, -1).astype(_F32), ((0, 0), (0, npad)))
    out = _gemv_packed_pallas(w_packed, x_lo, x_hi, sc, bn=bn,
                              bk_half=bk_half, interpret=interpret_mode())
    return out[:max(rows, 1), :n][:rows]


def _quantize_acts_w4a8(x, k_half: int):
    """Per-row int8 activation quant + split halves for the w4a8 GEMV:
    (xi_lo, xi_hi, sx [rows, 1] f32). Rows are padded to 8."""
    rows = x.shape[0] if x.ndim == 2 else 1
    xr = x.reshape(rows, -1).astype(jnp.float32)
    amax = jnp.max(jnp.abs(xr), axis=-1, keepdims=True)
    sx = jnp.maximum(amax / 127.0, 1e-12)
    xi = jnp.clip(jnp.round(xr / sx), -127, 127).astype(jnp.int8)
    rpad = max(8 - rows, 0)
    xi_lo = jnp.pad(xi[:, :k_half], ((0, rpad), (0, 0)))
    xi_hi = jnp.pad(xi[:, k_half:k_half * 2], ((0, rpad), (0, 0)))
    sx = jnp.pad(sx, ((0, rpad), (0, 0)))
    return xi_lo, xi_hi, sx, rows


def _w4a8_tile_dots(p, xl8, xh8):
    """Shared w4a8 tile math: zero-convert nibble unpack + NATIVE int8 MXU
    dots (the weight is never converted to bf16 at all — the bf16-unpack
    kernel was VPU-bound, device-traced at ~53 us/layer vs ~36 stream-ideal;
    this form measured 725 vs 574 GB/s packed on the 277 MB stream harness).
    u = low nibble + 8 (unsigned bits bitcast to int8), v16 = high nibble
    * 16; y_raw = dot(xi_lo, u) - 8*rowsum(xi_lo) + dot(xi_hi, v16)/16 —
    the +8 bias correction is a per-row scalar and the /16 an exact
    epilogue multiply."""
    u = jax.lax.bitcast_convert_type((p & 0x0F) ^ 0x08, jnp.int8)
    v16 = jax.lax.bitcast_convert_type(p & 0xF0, jnp.int8)
    dlo = jax.lax.dot_general(xl8, u, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    dhi = jax.lax.dot_general(xh8, v16, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    rs = jnp.sum(xl8.astype(jnp.int32), axis=1, keepdims=True)
    # combine in the EXACT integer domain (one f32 rounding at the final
    # convert): s = 16*(dlo - 8*rs) + dhi fits int32 for every legal tile
    # (|dlo-8rs| <= 127*8*bk_half, |dhi| <= 127*128*bk_half -> |s| < 2^31
    # up to bk_half 8192). s can exceed f32's 2^24 exact range for
    # bk_half >~ 1024 — the convert then rounds at 2^-24 RELATIVE, far
    # inside the int8-activation error envelope (~0.4% RMS).
    s = jnp.left_shift(dlo - 8 * rs, 4) + dhi
    return s.astype(_F32) * _F32(1.0 / 16.0)


def _gemv_w4a8_kernel(w_ref, xlo_ref, xhi_ref, sx_ref, scale_ref, o_ref,
                      acc_ref, *, n_k: int):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += _w4a8_tile_dots(w_ref[:], xlo_ref[:], xhi_ref[:])

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * scale_ref[:].astype(_F32)
                    * sx_ref[:].astype(_F32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn", "bk_half", "interpret"))
def _gemv_w4a8_pallas(w_packed, x_lo, x_hi, sx, scale, *, bn: int,
                      bk_half: int, interpret: bool):
    n, k_half = w_packed.shape
    rows = x_lo.shape[0]
    n_k = _cdiv(k_half, bk_half)
    kernel = functools.partial(_gemv_w4a8_kernel, n_k=n_k)
    return pl.pallas_call(
        kernel,
        grid=(_cdiv(n, bn), n_k),
        in_specs=[
            pl.BlockSpec((bn, bk_half), lambda ni, ki: (ni, ki)),
            pl.BlockSpec((rows, bk_half), lambda ni, ki: (0, ki)),
            pl.BlockSpec((rows, bk_half), lambda ni, ki: (0, ki)),
            pl.BlockSpec((rows, 1), lambda ni, ki: (0, 0)),
            pl.BlockSpec((1, bn), lambda ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((rows, bn), lambda ni, ki: (0, ni)),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((rows, bn), _F32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k_half * 2,
            bytes_accessed=n * k_half + k_half * 2 * 2 + n * 2,
            transcendentals=0),
        interpret=interpret,
    )(w_packed, x_lo, x_hi, sx, scale)


@functools.partial(jax.jit, static_argnames=("bn", "bk_half"))
def gemv_int4_w4a8(w_packed, x, scale=None, bn: int | None = None,
                   bk_half: int | None = None):
    """w4a8 int4 GEMV: y[rows,N] ~= x[rows,K] @ unpack(W_packed[N, K/2]).T
    * scale, with per-row int8 activation quantization feeding native int8
    MXU dots (the TPU analog of the reference's w8a8 GEMV fast path). Adds
    ~0.4% RMS activation error on top of int4's weight envelope."""
    n, k_half = w_packed.shape
    abn, abk = _tiles_for(n, k_half)
    bn = abn if bn is None else min(bn, n)
    bk_half = abk if bk_half is None else min(bk_half, k_half)
    npad = _cdiv(n, bn) * bn - n
    kpad_half = _cdiv(k_half, bk_half) * bk_half - k_half
    if npad or kpad_half:
        w_packed = jnp.pad(w_packed, ((0, npad), (0, kpad_half)))
    if x.shape[-1] < 2 * k_half:    # weight pack-padded an odd in-dim
        x = jnp.pad(x.reshape(x.shape[0] if x.ndim == 2 else 1, -1),
                    ((0, 0), (0, 2 * k_half - x.shape[-1])))
    xi_lo, xi_hi, sx, rows = _quantize_acts_w4a8(x, k_half)
    if kpad_half:
        xi_lo = jnp.pad(xi_lo, ((0, 0), (0, kpad_half)))
        xi_hi = jnp.pad(xi_hi, ((0, 0), (0, kpad_half)))
    if scale is None:
        scale = jnp.ones((n,), _F32)
    sc = jnp.pad(scale.reshape(1, -1).astype(_F32), ((0, 0), (0, npad)))
    out = _gemv_w4a8_pallas(w_packed, xi_lo, xi_hi, sx, sc, bn=bn,
                            bk_half=bk_half, interpret=interpret_mode())
    return out[:max(rows, 1), :n][:rows]


def _gemv_w4a8_stacked_kernel(idx_ref, w_ref, xlo_ref, xhi_ref, sx_ref,
                              scale_ref, o_ref, acc_ref, *, n_k: int):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += _w4a8_tile_dots(w_ref[0], xlo_ref[:], xhi_ref[:])

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * scale_ref[0].astype(_F32)
                    * sx_ref[:].astype(_F32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn", "bk_half", "interpret"))
def _gemv_w4a8_stacked_pallas(w_stack, idx, x_lo, x_hi, sx, scale_stack, *,
                              bn: int, bk_half: int, interpret: bool):
    n_layers, n, k_half = w_stack.shape
    rows = x_lo.shape[0]
    n_k = _cdiv(k_half, bk_half)
    kernel = functools.partial(_gemv_w4a8_stacked_kernel, n_k=n_k)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(_cdiv(n, bn), n_k),
            in_specs=[
                pl.BlockSpec((1, bn, bk_half),
                             lambda ni, ki, idx: (idx[0], ni, ki)),
                pl.BlockSpec((rows, bk_half), lambda ni, ki, idx: (0, ki)),
                pl.BlockSpec((rows, bk_half), lambda ni, ki, idx: (0, ki)),
                pl.BlockSpec((rows, 1), lambda ni, ki, idx: (0, 0)),
                pl.BlockSpec((1, 1, bn), lambda ni, ki, idx: (idx[0], 0, ni)),
            ],
            out_specs=pl.BlockSpec((rows, bn), lambda ni, ki, idx: (0, ni)),
            scratch_shapes=[pltpu.VMEM((rows, bn), _F32)],
        ),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k_half * 2,
            bytes_accessed=n * k_half + k_half * 2 * 2 + n * 2,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(idx, jnp.int32).reshape(1), w_stack, x_lo, x_hi, sx,
      scale_stack)


def _gemv_w4a8_stacked_fusedq_kernel(idx_ref, w_ref, x_ref, scale_ref,
                                     o_ref, xq_ref, sx_ref, acc_ref, *,
                                     n_k: int, bk_half: int):
    """Stacked w4a8 GEMV with IN-KERNEL activation quantization: the whole
    bf16 activation row arrives once, is quantized to int8 scratch at grid
    step (0, 0) (grid executes row-major on the sequential TPU core), and
    every tile dot reads its K-slice from scratch. Replaces the 4-per-layer
    XLA act-quant fusions between Pallas calls on the decode path. The
    quant math (f32 divide, round-half-even, clip, convert) is op-for-op
    _quantize_acts_w4a8, so outputs stay BITWISE equal to the sliced
    kernel fed by the XLA quant (asserted in test_pallas_kernels.py)."""
    ni = pl.program_id(0)
    ki = pl.program_id(1)
    k_half = n_k * bk_half                       # exact tiling precondition

    @pl.when((ni == 0) & (ki == 0))
    def _():
        xf = x_ref[:].astype(_F32)               # [rows, K]
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        sx = jnp.maximum(amax / _F32(127.0), _F32(1e-12))
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        sx_ref[:] = sx
        for j in range(n_k):                     # static lane slices
            xq_ref[j] = xq[:, j * bk_half:(j + 1) * bk_half]
            xq_ref[n_k + j] = xq[:, k_half + j * bk_half:
                                 k_half + (j + 1) * bk_half]

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += _w4a8_tile_dots(w_ref[0], xq_ref[ki], xq_ref[n_k + ki])

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * scale_ref[0].astype(_F32)
                    * sx_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn", "bk_half", "interpret"))
def _gemv_w4a8_stacked_fusedq_pallas(w_stack, idx, x, scale_stack, *,
                                     bn: int, bk_half: int, interpret: bool):
    n_layers, n, k_half = w_stack.shape
    rows = x.shape[0]
    n_k = _cdiv(k_half, bk_half)
    kernel = functools.partial(_gemv_w4a8_stacked_fusedq_kernel, n_k=n_k,
                               bk_half=bk_half)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(_cdiv(n, bn), n_k),
            in_specs=[
                pl.BlockSpec((1, bn, bk_half),
                             lambda ni, ki, idx: (idx[0], ni, ki)),
                pl.BlockSpec((rows, 2 * k_half),
                             lambda ni, ki, idx: (0, 0)),
                pl.BlockSpec((1, 1, bn), lambda ni, ki, idx: (idx[0], 0, ni)),
            ],
            out_specs=pl.BlockSpec((rows, bn), lambda ni, ki, idx: (0, ni)),
            scratch_shapes=[pltpu.VMEM((2 * n_k, rows, bk_half), jnp.int8),
                            pltpu.VMEM((rows, 1), _F32),
                            pltpu.VMEM((rows, bn), _F32)],
        ),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            # NOT ("parallel", ...): the xq/sx scratch is written only at
            # grid step (0, 0) and read by every ni — correct only under
            # sequential row-major execution, which "arbitrary" guarantees
            # (a megacore TPU could otherwise split ni across cores and
            # read uninitialized scratch).
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k_half * 2,
            bytes_accessed=n * k_half + k_half * 2 * 2 + n * 2,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(idx, jnp.int32).reshape(1), w_stack, x, scale_stack)


def gemv_int4_w4a8_stacked(w_stack, idx, x, scale_stack,
                           bn: int | None = None,
                           bk_half: int | None = None):
    """w4a8 form of gemv_int4_packed_stacked: layer ``idx`` of a stacked
    packed-int4 weight [L, N, K/2], activations quantized per row to int8
    feeding native int8 MXU dots. Same exact-tiling precondition.

    Activation quant runs IN-KERNEL by default (fused-quant form above);
    PYGPUKIT_W4A8_QUANT=xla opts back to the XLA-side quant + the
    3-operand kernel (bitwise-identical outputs either way)."""
    import os
    n_layers, n, k_half = w_stack.shape
    abn, abk = _tiles_for(n, k_half)
    bn = abn if bn is None else min(bn, n)
    bk_half = abk if bk_half is None else min(bk_half, k_half)
    if n % bn or k_half % bk_half:
        raise ValueError(
            f"stacked int4 GEMV needs exact tiling: N={n} bn={bn}, "
            f"K/2={k_half} bk_half={bk_half}")
    sc = scale_stack.reshape(n_layers, 1, n).astype(_F32)
    if os.environ.get("PYGPUKIT_W4A8_QUANT", "kernel") != "xla":
        rows = x.shape[0] if x.ndim == 2 else 1
        xr = x.reshape(rows, -1)       # keep the caller dtype: the kernel
        # quantizes from f32(x) exactly like _quantize_acts_w4a8, so an
        # f32 caller must not lose bits to a bf16 staging cast
        if rows < 8:
            xr = jnp.pad(xr, ((0, 8 - rows), (0, 0)))
        out = _gemv_w4a8_stacked_fusedq_pallas(w_stack, idx, xr, sc,
                                               bn=bn, bk_half=bk_half,
                                               interpret=interpret_mode())
        return out[:max(rows, 1), :n][:rows]
    xi_lo, xi_hi, sx, rows = _quantize_acts_w4a8(x, k_half)
    out = _gemv_w4a8_stacked_pallas(w_stack, idx, xi_lo, xi_hi, sx, sc,
                                    bn=bn, bk_half=bk_half,
                                    interpret=interpret_mode())
    return out[:max(rows, 1), :n][:rows]


def _gemv_conv_stacked_kernel(idx_ref, w_ref, x_ref, scale_ref, o_ref,
                              acc_ref, *, n_k: int):
    """Stacked dtype-converting GEMV (fp8 / int8-w8a16 / bf16 weights in
    K-major [L, K, N] model layout): the tile converts to bf16 IN-REGISTER
    after the DMA, so the fp8 bytes are all that streams from HBM — the
    XLA formulation materializes the bf16 convert of every projection
    (VERDICT r3: fp8 decode 449.8 tok/s vs int8's 527.4 at identical
    weight bytes). Layer selected via scalar-prefetch index_maps like the
    w4a8 stacked kernel."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[0].astype(jnp.bfloat16)            # [bk, bn] convert in-register
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16), w, (((1,), (0,)), ((), ())),
        preferred_element_type=_F32)

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * scale_ref[0].astype(_F32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn", "bk", "interpret"))
def _gemv_conv_stacked_pallas(w_stack, idx, x, scale_stack, *, bn: int,
                              bk: int, interpret: bool):
    n_layers, k, n = w_stack.shape
    rows = x.shape[0]
    n_k = _cdiv(k, bk)
    kernel = functools.partial(_gemv_conv_stacked_kernel, n_k=n_k)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(_cdiv(n, bn), n_k),
            in_specs=[
                pl.BlockSpec((1, bk, bn),
                             lambda ni, ki, idx: (idx[0], ki, ni)),
                pl.BlockSpec((rows, bk), lambda ni, ki, idx: (0, ki)),
                pl.BlockSpec((1, 1, bn), lambda ni, ki, idx: (idx[0], 0, ni)),
            ],
            out_specs=pl.BlockSpec((rows, bn), lambda ni, ki, idx: (0, ni)),
            scratch_shapes=[pltpu.VMEM((rows, bn), _F32)],
        ),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k,
            bytes_accessed=n * k * w_stack.dtype.itemsize + k * 2 + n * 2,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(idx, jnp.int32).reshape(1), w_stack, x, scale_stack)


def _adaptive_tiles_conv(k: int, n: int):
    """Tile choice for the K-major converting GEMV: N on lanes, K on
    sublanes, both the LARGEST multiple-of-(128 / 256) DIVISOR up to ~2816
    (exact tiling is the stacked kernel's precondition, so divisor-aware
    selection is what keeps real shapes — down 5632, head 32000 — eligible
    instead of falling back over a remainder tile)."""
    bn = 0
    for m in range(min(n // 128, 22), 0, -1):    # 22*128 = 2816 lane cap
        if n % (m * 128) == 0:
            bn = m * 128
            break
    if not bn:
        bn = min(n, 2816)
    bk = 0
    for m in range(min(k // 256, 11), 0, -1):    # 11*256 = 2816 sublane cap
        if k % (m * 256) == 0:
            bk = m * 256
            break
    if not bk:
        bk = min(k, 2048)
    return bn, bk


def conv_stacked_tiles_exact(k: int, n: int) -> bool:
    """True when the adaptive tiles divide [K, N] exactly (the stacked
    converting GEMV's no-padding precondition — padding a stacked weight
    per call would copy the stack the kernel exists to avoid)."""
    bn, bk = _adaptive_tiles_conv(k, n)
    return n % bn == 0 and k % bk == 0


def gemv_conv_stacked(w_stack, idx, x, scale_stack, bn: int | None = None,
                      bk: int | None = None):
    """y[rows, N] = x[rows, K] @ convert(W_stack[idx]) * scale for a
    stacked [L, K, N] fp8/int8/bf16 weight with stacked per-column scales
    [L, 1, N] — zero weight copies, convert in-register (fp8 streams fp8
    bytes). Exact-tiling precondition; callers gate on
    ``conv_stacked_tiles_exact`` and fall back to the XLA dot."""
    n_layers, k, n = w_stack.shape
    abn, abk = _adaptive_tiles_conv(k, n)
    bn = abn if bn is None else min(bn, n)
    bk = abk if bk is None else min(bk, k)
    if n % bn or k % bk:
        raise ValueError(
            f"stacked conv GEMV needs exact tiling: N={n} bn={bn}, "
            f"K={k} bk={bk}")
    rows = x.shape[0] if x.ndim == 2 else 1
    xr = x.reshape(rows, -1).astype(jnp.bfloat16)
    if xr.shape[-1] != k:
        raise ValueError(f"x K dim {xr.shape[-1]} != weight K {k}")
    rpad = max(8 - rows, 0)
    if rpad:
        xr = jnp.pad(xr, ((0, rpad), (0, 0)))
    sc = scale_stack.reshape(n_layers, 1, n).astype(_F32)
    out = _gemv_conv_stacked_pallas(w_stack, idx, xr, sc, bn=bn, bk=bk,
                                    interpret=interpret_mode())
    return out[:max(rows, 1), :n][:rows]


def _gemm_w4a8_kernel(w_ref, xlo_ref, xhi_ref, sx_ref, scale_ref, o_ref,
                      acc_ref, *, n_k: int):
    """w4a8 int4 GEMM tile (M>1): same _w4a8_tile_dots body as the GEMV —
    in-register nibble unpack feeding NATIVE int8 MXU dots with int32
    accumulation — extended with an M grid dimension. At GEMM M the kernel
    is MXU-bound, so the win over the XLA dequant-dot is the int8 MXU rate
    (~309 TOPS measured vs ~178 TFLOPS bf16): the 4-bit GEMM rung the
    reference ships as int4-via-int8 121 TFLOPS / NVF4 261-446
    (reference native/ops/matmul/gemm/{int4_int4,w4a16_bf16}/)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += _w4a8_tile_dots(w_ref[:], xlo_ref[:], xhi_ref[:])

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * scale_ref[:].astype(_F32)
                    * sx_ref[:].astype(_F32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk_half",
                                             "interpret"))
def _gemm_w4a8_pallas(w_packed, x_lo, x_hi, sx, scale, *, bm: int, bn: int,
                      bk_half: int, interpret: bool):
    n, k_half = w_packed.shape
    m = x_lo.shape[0]
    n_k = _cdiv(k_half, bk_half)
    kernel = functools.partial(_gemm_w4a8_kernel, n_k=n_k)
    return pl.pallas_call(
        kernel,
        grid=(_cdiv(m, bm), _cdiv(n, bn), n_k),
        in_specs=[
            pl.BlockSpec((bn, bk_half), lambda mi, ni, ki: (ni, ki)),
            pl.BlockSpec((bm, bk_half), lambda mi, ni, ki: (mi, ki)),
            pl.BlockSpec((bm, bk_half), lambda mi, ni, ki: (mi, ki)),
            pl.BlockSpec((bm, 1), lambda mi, ni, ki: (mi, 0)),
            pl.BlockSpec((1, bn), lambda mi, ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mi, ni, ki: (mi, ni)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), _F32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k_half * 2,
            bytes_accessed=n * k_half + m * k_half * 2 + m * n * 2,
            transcendentals=0),
        interpret=interpret,
    )(w_packed, x_lo, x_hi, sx, scale)


def _gemm_tiles_for(m: int, n: int, k_half: int):
    """GEMM tile choice: MXU-bound regime — [bm, bn] big enough to amortize
    the two per-tile dots' fixed cost, small enough that w + 2 x-slices +
    acc stay well inside VMEM (~bm*bk_half*2 + bn*bk_half + bm*bn*6)."""
    bm = min(256, _cdiv(m, 8) * 8)

    def divisor_tile(dim, unit, cap_units):
        # exact DIVISORS preferred: a non-dividing bk pads the packed
        # weight — a full copy EVERY call, measured 0.42x of the XLA dot
        # on the K=5632 down projection
        for mm in range(min(dim // unit, cap_units), 0, -1):
            if dim % (mm * unit) == 0:
                return mm * unit
        return min(dim, cap_units * unit)

    bn = divisor_tile(n, 128, 8)                 # <= 1024 lanes
    bk_half = divisor_tile(k_half, 128, 11)      # <= 1408 sublanes
    return max(bm, 8), max(bn, 128), max(bk_half, 128)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk_half"))
def gemm_int4_w4a8(w_packed, x, scale=None, bm: int | None = None,
                   bn: int | None = None, bk_half: int | None = None):
    """w4a8 int4 GEMM: y[M, N] ~= x[M, K] @ unpack(W_packed[N, K/2]).T *
    scale, per-row int8 activation quantization feeding native int8 MXU
    dots. The M>1 member of the w4a8 family (VERDICT r3 #3): model._mm
    routes plain-int4 leaves here for M>8 rows on TPU — but ONLY for
    UNSLICED 2-D weights (lm head, direct calls; env opt-out
    PYGPUKIT_INT4_GEMM=xla): a pallas_call cannot absorb a layer
    dynamic-slice, so in-loop sliced operands stay on the XLA dequant
    dot (model._mm sliced_here). Measured 218.3 vs the XLA dequant
    dot's 152.8 TOPS at the reference's quant-table shape. Split-half
    packing identical to gemv_int4_packed."""
    n, k_half = w_packed.shape
    m = x.shape[0]
    abm, abn, abk = _gemm_tiles_for(m, n, k_half)
    bm = abm if bm is None else max(8, bm)
    bn = abn if bn is None else min(bn, n)
    bk_half = abk if bk_half is None else min(bk_half, k_half)
    if x.shape[-1] > 2 * k_half:
        raise ValueError(
            f"x K dim {x.shape[-1]} exceeds packed weight K {2 * k_half}")
    npad = _cdiv(n, bn) * bn - n
    kpad_half = _cdiv(k_half, bk_half) * bk_half - k_half
    if npad or kpad_half:
        w_packed = jnp.pad(w_packed, ((0, npad), (0, kpad_half)))
    if x.shape[-1] < 2 * k_half:    # weight pack-padded an odd in-dim
        x = jnp.pad(x, ((0, 0), (0, 2 * k_half - x.shape[-1])))
    xf = x.astype(_F32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(amax / 127.0, 1e-12)
    xi = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    mpad = _cdiv(m, bm) * bm - m
    xi_lo = jnp.pad(xi[:, :k_half], ((0, mpad), (0, kpad_half)))
    xi_hi = jnp.pad(xi[:, k_half:k_half * 2], ((0, mpad), (0, kpad_half)))
    sxp = jnp.pad(sx, ((0, mpad), (0, 0)))
    if scale is None:
        scale = jnp.ones((n,), _F32)
    sc = jnp.pad(scale.reshape(1, -1).astype(_F32), ((0, 0), (0, npad)))
    out = _gemm_w4a8_pallas(w_packed, xi_lo, xi_hi, sxp, sc, bm=bm, bn=bn,
                            bk_half=bk_half, interpret=interpret_mode())
    return out[:m, :n]


def _block_scale_expand(s, blk: int):
    """[nb, bn] f32 scale tile (a value, not a ref) -> [nb*blk, bn] bf16, rows repeated
    ``blk`` times along sublanes. Pure VPU: a sublane broadcast + major-dim
    reshape (Mosaic lowers both; it is the LANE-dim merge [bn, nb, blk] ->
    [bn, nb*blk] that is an unsupported shape cast). This is the whole point
    of the K-major int4_block layout: the N-major layout could only expand
    scales with MXU dots against 0/1 iota matrices, which cost ~2x the main
    GEMV's MXU work and made int4_block 1.85x slower than plain int4."""
    nb, bn = s.shape
    s = s.astype(jnp.bfloat16)
    return jnp.broadcast_to(s[:, None, :], (nb, blk, bn)).reshape(
        nb * blk, bn)


def _block_tile_dots(p, xlo, xhi, slo, shi, blk):
    """Shared K-major block-scaled tile math for the sliced AND stacked
    kernels: unpack, expand the lo/hi scale tiles along sublanes, two bf16
    MXU dots with the exact 1/16 folded into x_hi."""
    lo, hi16 = _unpack_nibbles_bf16(p)
    wlo = lo * _block_scale_expand(slo, blk)
    whi = hi16 * _block_scale_expand(shi, blk)
    return (jax.lax.dot_general(
                xlo.astype(jnp.bfloat16), wlo, (((1,), (0,)), ((), ())),
                preferred_element_type=_F32)
            + jax.lax.dot_general(
                xhi.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 16.0), whi,
                (((1,), (0,)), ((), ())), preferred_element_type=_F32))


def _block_w4a8_tile_dots(p, xlo8, xhi8, slo, shi, blk, real_rows=None):
    """w4a8 block-scaled tile math (int4_block v2): native int8 MXU dots
    with the per-block scales applied POST-dot via the Z-decomposition.

    The v1 bf16 formulation was VPU-bound (device-traced 2.5-2.9x stream
    time on every projection: the in-register unpack CONVERTS every nibble
    to bf16 and multiplies the whole [bk, bn] tile by the expanded scales).
    Here the nibbles stay int8 (bitcast only), and the block structure is
    recovered on the OUTPUT side: build the block-expanded activation
    Xb[b*rows + r, j] = xq[r, j] * (j//blk == b), one int8 dot gives
    Z[b*rows + r, n] = sum_{j in block b} xq[r, j] * w[j, n] for ALL blocks
    in one MXU pass (M = nb*rows <= 256 costs the same as M = rows — the
    measured Mosaic dot law), then y[r, n] = sum_b s[b, n] * Z_corr — a
    [nb, rows, bn] multiply-reduce, ~30x less VPU work than v1.
    """
    nb = slo.shape[0]
    rows = xlo8.shape[0]
    # Only the REAL rows enter the block expansion: the wrappers pad x to
    # 8 sublane rows, and M = nb*rows is where the MXU cost lives — the
    # down projection at bk_half 2816 / blk 32 has nb = 88, so padded rows
    # cost M = 704 (device-traced 1195 us/tok, WORSE than v1) while the
    # decode's real M is 88.
    r = rows if real_rows is None else min(real_rows, rows)
    bk = xlo8.shape[1]
    u = jax.lax.bitcast_convert_type((p & 0x0F) ^ 0x08, jnp.int8)
    v16 = jax.lax.bitcast_convert_type(p & 0xF0, jnp.int8)
    # block-expansion mask [nb, 1, bk]: row b keeps columns of block b
    bidx = jax.lax.broadcasted_iota(jnp.int32, (nb, 1, bk), 2) // blk
    mask = bidx == jax.lax.broadcasted_iota(jnp.int32, (nb, 1, bk), 0)

    def z_corr(x8, w8, bias):
        # lax.slice_in_dim, NOT x8[None, :r]: jnp rewrites that indexing
        # into lax.gather, which Mosaic's gather rule rejects here
        xr = jax.lax.expand_dims(jax.lax.slice_in_dim(x8, 0, r, axis=0), (0,))
        xb = jnp.where(mask, xr, jnp.int8(0)).reshape(nb * r, bk)
        z = jax.lax.dot_general(xb, w8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        if bias:
            # u carries +8: subtract 8 * per-(block,row) activation sum
            z = z - 8 * jnp.sum(xb.astype(jnp.int32), axis=1, keepdims=True)
        return z.reshape(nb, r, -1).astype(_F32)

    ylo = jnp.sum(z_corr(xlo8, u, True) * slo.astype(_F32)[:, None, :],
                  axis=0)
    yhi = jnp.sum(z_corr(xhi8, v16, False) * shi.astype(_F32)[:, None, :],
                  axis=0)
    # [r, bn] — REAL rows only; the caller accumulates into acc_ref[:r]
    # (a static sublane slice). jnp.pad back to ``rows`` here lowers
    # through a gather Mosaic rejects ("Shape mismatch in input, indices
    # and output") — do not reintroduce it.
    return ylo + yhi * _F32(1.0 / 16.0)


def _split_scale_stack(s_stack, half_b: int):
    """Split the stacked [L, K/B, N] block-scale array into separate lo/hi
    operands ([L, K/(2B), N] each) OUTSIDE the pallas_call.

    Passing the same array twice (lo rows at block ki, hi at n_k + ki)
    counted its bytes twice against XLA's scoped-VMEM operand budget: in
    the real decode loop the down-proj stack (bf16[22,176,2048], 15.9 MB)
    was re-copied HBM->VMEM EVERY layer step (device-traced 171 us/tok of
    copy-done wait + ~350 MB/tok of copy traffic) while standalone
    compiles of the identical kernel showed no copy at all.

    NOTE for jitted callers: XLA does NOT hoist these slices out of a
    decode loop — traced per-step slice fusions cost 2.3 ms/tok when the
    split ran inside the chunk executable. Hot paths must pass PRE-SPLIT
    device arrays (model.prepare_block_scales adds ``scale_lo``/
    ``scale_hi`` leaves at model build); this in-wrapper split is the
    correctness fallback for standalone/eager callers only."""
    return s_stack[:, :half_b], s_stack[:, half_b:]


def _gemv_block_w4a8_stacked_kernel(idx_ref, w_ref, xlo_ref, xhi_ref,
                                    sx_ref, slo_ref, shi_ref, o_ref,
                                    acc_ref, *, n_k: int, blk: int,
                                    real_rows: int):
    """Stacked K-major block-scaled w4a8 GEMV (int4_block v2): same
    operands as the v1 stacked kernel plus the per-row activation scale,
    int8 activations feeding native int8 MXU dots."""
    ki = pl.program_id(1)
    r = min(real_rows, acc_ref.shape[0])

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:r] += _block_w4a8_tile_dots(w_ref[0], xlo_ref[:], xhi_ref[:],
                                         slo_ref[0], shi_ref[0], blk,
                                         real_rows)

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * sx_ref[:].astype(_F32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn", "bk_half", "blk",
                                             "real_rows", "interpret"))
def _gemv_block_w4a8_stacked_pallas(w_stack, idx, x_lo, x_hi, sx,
                                    slo_stack, shi_stack,
                                    *, bn: int, bk_half: int, blk: int,
                                    real_rows: int, interpret: bool):
    n_layers, k_half, n = w_stack.shape
    rows = x_lo.shape[0]
    n_k = _cdiv(k_half, bk_half)
    nb = bk_half // blk
    kernel = functools.partial(_gemv_block_w4a8_stacked_kernel, n_k=n_k,
                               blk=blk, real_rows=real_rows)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(_cdiv(n, bn), n_k),
            in_specs=[
                pl.BlockSpec((1, bk_half, bn),
                             lambda ni, ki, idx: (idx[0], ki, ni)),
                pl.BlockSpec((rows, bk_half), lambda ni, ki, idx: (0, ki)),
                pl.BlockSpec((rows, bk_half), lambda ni, ki, idx: (0, ki)),
                pl.BlockSpec((rows, 1), lambda ni, ki, idx: (0, 0)),
                pl.BlockSpec((1, nb, bn),
                             lambda ni, ki, idx: (idx[0], ki, ni)),
                pl.BlockSpec((1, nb, bn),
                             lambda ni, ki, idx: (idx[0], ki, ni)),
            ],
            out_specs=pl.BlockSpec((rows, bn), lambda ni, ki, idx: (0, ni)),
            scratch_shapes=[pltpu.VMEM((rows, bn), _F32)],
        ),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k_half * 2,
            bytes_accessed=n * k_half + n * k_half // blk * 4 * 2
            + k_half * 2 * 2 + n * 2,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(idx, jnp.int32).reshape(1), w_stack, x_lo, x_hi, sx,
      slo_stack, shi_stack)


def _gemv_block_w4a8_stacked_fusedq_kernel(idx_ref, w_ref, x_ref, slo_ref,
                                           shi_ref, o_ref, xq_ref, sx_ref,
                                           acc_ref, *, n_k: int,
                                           bk_half: int, blk: int,
                                           real_rows: int):
    """int4_block w4a8 stacked GEMV with IN-KERNEL activation quant: the
    bf16 activation row arrives once, quantizes to int8 scratch at grid
    step (0, 0), and every tile dot reads its K-slice from scratch —
    op-for-op _quantize_acts_w4a8, so outputs are bitwise equal to the
    XLA-quant form (same win as the plain-int4 fusedq kernel: it deletes
    the 4-per-layer act-quant fusions, ~72 us/tok traced on this rung)."""
    ni = pl.program_id(0)
    ki = pl.program_id(1)
    k_half = n_k * bk_half
    r = min(real_rows, acc_ref.shape[0])

    @pl.when((ni == 0) & (ki == 0))
    def _():
        xf = x_ref[:].astype(_F32)               # [rows, K]
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        sx = jnp.maximum(amax / _F32(127.0), _F32(1e-12))
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        sx_ref[:] = sx
        for j in range(n_k):                     # static lane slices
            xq_ref[j] = xq[:, j * bk_half:(j + 1) * bk_half]
            xq_ref[n_k + j] = xq[:, k_half + j * bk_half:
                                 k_half + (j + 1) * bk_half]

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:r] += _block_w4a8_tile_dots(w_ref[0], xq_ref[ki],
                                         xq_ref[n_k + ki], slo_ref[0],
                                         shi_ref[0], blk, real_rows)

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * sx_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn", "bk_half", "blk",
                                             "real_rows", "interpret"))
def _gemv_block_w4a8_stacked_fusedq_pallas(w_stack, idx, x, slo_stack,
                                           shi_stack, *,
                                           bn: int, bk_half: int, blk: int,
                                           real_rows: int, interpret: bool):
    n_layers, k_half, n = w_stack.shape
    rows = x.shape[0]
    n_k = _cdiv(k_half, bk_half)
    nb = bk_half // blk
    kernel = functools.partial(_gemv_block_w4a8_stacked_fusedq_kernel,
                               n_k=n_k, bk_half=bk_half, blk=blk,
                               real_rows=real_rows)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(_cdiv(n, bn), n_k),
            in_specs=[
                pl.BlockSpec((1, bk_half, bn),
                             lambda ni, ki, idx: (idx[0], ki, ni)),
                pl.BlockSpec((rows, 2 * k_half),
                             lambda ni, ki, idx: (0, 0)),
                pl.BlockSpec((1, nb, bn),
                             lambda ni, ki, idx: (idx[0], ki, ni)),
                pl.BlockSpec((1, nb, bn),
                             lambda ni, ki, idx: (idx[0], ki, ni)),
            ],
            out_specs=pl.BlockSpec((rows, bn), lambda ni, ki, idx: (0, ni)),
            scratch_shapes=[pltpu.VMEM((2 * n_k, rows, bk_half), jnp.int8),
                            pltpu.VMEM((rows, 1), _F32),
                            pltpu.VMEM((rows, bn), _F32)],
        ),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            # NOT ("parallel", ...): xq/sx scratch is written only at grid
            # step (0, 0) and read by every ni — sequential row-major
            # execution only (same rule as the plain-int4 fusedq kernel)
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k_half * 2,
            bytes_accessed=n * k_half + n * k_half // blk * 2 * 2
            + k_half * 2 * 2 + n * 2,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(idx, jnp.int32).reshape(1), w_stack, x, slo_stack,
      shi_stack)


def gemv_int4_block_w4a8_stacked(w_stack, idx, x, scale_block_stack,
                                 bn: int | None = None,
                                 bk_half: int | None = None,
                                 slo_stack=None, shi_stack=None):
    """w4a8 form of gemv_int4_block_stacked: layer ``idx`` of a stacked
    K-major block-scaled packed-int4 weight [L, K/2, N] with native scales
    [L, K/B, N], activations quantized per row to int8 feeding native int8
    MXU dots (scales applied post-dot per block — see
    _block_w4a8_tile_dots). Adds the same ~0.4% RMS activation error as
    the plain-int4 w4a8 rung. Same exact-aligned-tiling precondition as
    the v1 kernel. Jitted hot loops must pass pre-split ``slo_stack``/
    ``shi_stack`` device arrays (see _split_scale_stack)."""
    n_layers, k_half, n = w_stack.shape
    k = 2 * k_half
    blk = k // scale_block_stack.shape[-2]
    abn, abk = _adaptive_tiles_km(k_half, n, blk)
    bn = abn if bn is None else min(bn, n)
    bk_half = abk if bk_half is None else min(bk_half, k_half)
    interp = interpret_mode()
    if (n % bn or k_half % bk_half or bk_half % blk
            or (not interp and (bk_half // blk) % 8)):
        raise ValueError(
            f"stacked int4_block w4a8 GEMV needs exact aligned tiling"
            f"{'' if interp else ' with 8 | bk_half/blk'}: N={n} "
            f"bn={bn}, K/2={k_half} bk_half={bk_half}, blk={blk}")
    # pass the scale stacks in their STORED dtype (bf16 since round 4): an
    # astype here would stream an f32 copy from HBM; the kernel upcasts
    # per tile in-register
    if slo_stack is None:
        slo_stack, shi_stack = _split_scale_stack(scale_block_stack,
                                                  k_half // blk)
    if os.environ.get("PYGPUKIT_W4A8_QUANT", "kernel") != "xla":
        rows = x.shape[0] if x.ndim == 2 else 1
        xr = x.reshape(rows, -1)
        if rows < 8:
            xr = jnp.pad(xr, ((0, 8 - rows), (0, 0)))
        out = _gemv_block_w4a8_stacked_fusedq_pallas(
            w_stack, idx, xr, slo_stack, shi_stack, bn=bn, bk_half=bk_half,
            blk=blk, real_rows=rows, interpret=interp)
        return out[:max(rows, 1), :n][:rows]
    xi_lo, xi_hi, sx, rows = _quantize_acts_w4a8(x, k_half)
    out = _gemv_block_w4a8_stacked_pallas(
        w_stack, idx, xi_lo, xi_hi, sx,
        slo_stack, shi_stack, bn=bn, bk_half=bk_half, blk=blk,
        real_rows=rows, interpret=interp)
    return out[:max(rows, 1), :n][:rows]


def _gemv_block_stacked_kernel(idx_ref, w_ref, xlo_ref, xhi_ref, slo_ref,
                               shi_ref, o_ref, acc_ref, *, n_k: int,
                               blk: int):
    """Stacked K-major block-scaled packed-int4 GEMV. The weight tile is
    [bk_half, bn] with K on SUBLANES (packed row r holds W[k] in the low
    nibble and W[K/2 + k] in the high one), so the per-block scales expand
    with a sublane broadcast (see _block_scale_expand) and the dot is a
    plain x @ W contraction — the same 2-dots-per-tile MXU cost as the
    per-column int4 kernel. The lo/hi scale operands are pre-split halves
    of the [K/B, N] stack (see _split_scale_stack); hi16 carries the high
    nibble *16, the exact 1/16 folding into x_hi as an exponent shift."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += _block_tile_dots(w_ref[0], xlo_ref[:], xhi_ref[:],
                                   slo_ref[0], shi_ref[0], blk)

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn", "bk_half", "blk",
                                             "interpret"))
def _gemv_block_stacked_pallas(w_stack, idx, x_lo, x_hi, slo_stack,
                               shi_stack, *,
                               bn: int, bk_half: int, blk: int,
                               interpret: bool):
    n_layers, k_half, n = w_stack.shape
    rows = x_lo.shape[0]
    n_k = _cdiv(k_half, bk_half)
    nb = bk_half // blk
    kernel = functools.partial(_gemv_block_stacked_kernel, n_k=n_k, blk=blk)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(_cdiv(n, bn), n_k),
            in_specs=[
                pl.BlockSpec((1, bk_half, bn),
                             lambda ni, ki, idx: (idx[0], ki, ni)),
                pl.BlockSpec((rows, bk_half), lambda ni, ki, idx: (0, ki)),
                pl.BlockSpec((rows, bk_half), lambda ni, ki, idx: (0, ki)),
                # pre-split lo/hi scale stacks (see _split_scale_stack)
                pl.BlockSpec((1, nb, bn),
                             lambda ni, ki, idx: (idx[0], ki, ni)),
                pl.BlockSpec((1, nb, bn),
                             lambda ni, ki, idx: (idx[0], ki, ni)),
            ],
            out_specs=pl.BlockSpec((rows, bn), lambda ni, ki, idx: (0, ni)),
            scratch_shapes=[pltpu.VMEM((rows, bn), _F32)],
        ),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k_half * 2,
            bytes_accessed=n * k_half + n * k_half // blk * 4 * 2
            + k_half * 2 * 2 + n * 2,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(idx, jnp.int32).reshape(1), w_stack, x_lo, x_hi,
      slo_stack, shi_stack)


def gemv_int4_block_stacked(w_stack, idx, x, scale_block_stack,
                            bn: int | None = None,
                            bk_half: int | None = None,
                            slo_stack=None, shi_stack=None):
    """y[rows, N] for layer ``idx`` of a stacked K-MAJOR block-scaled
    packed-int4 weight [L, K/2, N] with native scales [L, K/B, N] — zero
    weight copies and zero scale transposes. Requires exact tiling, blk |
    bk_half, and 8 | nb (scale sublane offsets); callers gate and fall
    back to the sliced form. Jitted hot loops must pass pre-split
    ``slo_stack``/``shi_stack`` device arrays (see _split_scale_stack)."""
    n_layers, k_half, n = w_stack.shape
    k = 2 * k_half
    blk = k // scale_block_stack.shape[-2]
    abn, abk = _adaptive_tiles_km(k_half, n, blk)
    bn = abn if bn is None else min(bn, n)
    bk_half = abk if bk_half is None else min(bk_half, k_half)
    interp = interpret_mode()
    if (n % bn or k_half % bk_half or bk_half % blk
            or (not interp and (bk_half // blk) % 8)):
        # 8 | nb keeps the [nb, bn] scale tiles sublane-aligned — a Mosaic
        # lowering rule, so it binds on device only (interpret mode is the
        # parity-test vehicle and accepts any exact tiling)
        raise ValueError(
            f"stacked int4_block GEMV needs exact aligned tiling"
            f"{'' if interp else ' with 8 | bk_half/blk'}: N={n} "
            f"bn={bn}, K/2={k_half} bk_half={bk_half}, blk={blk}")
    rows = x.shape[0] if x.ndim == 2 else 1
    xr = x.reshape(rows, -1).astype(jnp.bfloat16)
    rpad = max(8 - rows, 0)
    x_lo = jnp.pad(xr[:, :k_half], ((0, rpad), (0, 0)))
    x_hi = jnp.pad(xr[:, k_half:k_half * 2], ((0, rpad), (0, 0)))
    if slo_stack is None:
        slo_stack, shi_stack = _split_scale_stack(scale_block_stack,
                                                  k_half // blk)
    out = _gemv_block_stacked_pallas(
        w_stack, idx, x_lo, x_hi,
        slo_stack, shi_stack, bn=bn, bk_half=bk_half, blk=blk,
        interpret=interp)
    return out[:max(rows, 1), :n][:rows]


def _gemv_block_kernel(w_ref, xlo_ref, xhi_ref, slo_ref, shi_ref, o_ref,
                       acc_ref, *, n_k: int, blk: int):
    """K-major block-scaled packed-int4 GEMV (NVF4 analog — reference
    native/ops/matmul/gemm/w4a16_bf16/): weight tile [bk_half, bn] with K
    on sublanes; scales vary along K in blocks of ``blk`` and expand with
    a sublane broadcast (see _block_scale_expand — zero extra MXU work).
    The exact 1/16 for the high nibble folds into x_hi."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += _block_tile_dots(w_ref[:], xlo_ref[:], xhi_ref[:],
                                   slo_ref[:], shi_ref[:], blk)

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn", "bk_half", "blk",
                                             "interpret"))
def _gemv_block_pallas(w_packed, x_lo, x_hi, s_block, *, bn: int,
                       bk_half: int, blk: int, interpret: bool):
    k_half, n = w_packed.shape
    rows = x_lo.shape[0]
    n_k = _cdiv(k_half, bk_half)
    nb = bk_half // blk
    kernel = functools.partial(_gemv_block_kernel, n_k=n_k, blk=blk)
    return pl.pallas_call(
        kernel,
        grid=(_cdiv(n, bn), n_k),
        in_specs=[
            pl.BlockSpec((bk_half, bn), lambda ni, ki: (ki, ni)),
            pl.BlockSpec((rows, bk_half), lambda ni, ki: (0, ki)),
            pl.BlockSpec((rows, bk_half), lambda ni, ki: (0, ki)),
            # the SAME [K/B, N] scale array twice: lo rows at block ki,
            # hi rows at block n_k + ki (half_b = n_k * nb after padding)
            pl.BlockSpec((nb, bn), lambda ni, ki: (ki, ni)),
            pl.BlockSpec((nb, bn), lambda ni, ki: (n_k + ki, ni)),
        ],
        out_specs=pl.BlockSpec((rows, bn), lambda ni, ki: (0, ni)),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((rows, bn), _F32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k_half * 2,
            bytes_accessed=n * k_half + n * k_half // blk * 4 * 2
            + k_half * 2 * 2 + n * 2,
            transcendentals=0),
        interpret=interpret,
    )(w_packed, x_lo, x_hi, s_block, s_block)


@functools.partial(jax.jit, static_argnames=("bn", "bk_half"))
def gemv_int4_block(w_packed, x, scale_block, bn: int | None = None,
                    bk_half: int | None = None):
    """y[rows,N] = x[rows,K] @ dequant(W_packed, scale_block) with
    per-(K-block, column) scales [K/B, N] and K-MAJOR packed storage
    [K/2, N] (low nibble = W[:K/2], high = W[K/2:]). Requires B | K/2
    (callers fall back to the XLA formulation otherwise — llm/model._mm)."""
    k_half, n = w_packed.shape
    k = 2 * k_half
    blk = k // scale_block.shape[0]
    if k % scale_block.shape[0] or k_half % blk:
        # the lo/hi scale-half split at half_b = K/2 // B silently
        # misassigns the block straddling the K/2 boundary otherwise
        raise ValueError(
            f"int4_block GEMV requires B | K/2: K={k}, "
            f"K/B={scale_block.shape[0]} -> B={blk}, K/2={k_half}")
    abn, abk = _adaptive_tiles_km(k_half, n, blk)
    bn = abn if bn is None else min(bn, n)
    bk_half = abk if bk_half is None else min(bk_half, k_half)
    if bk_half % blk:
        bk_half = max(blk, bk_half - bk_half % blk)
    npad = _cdiv(n, bn) * bn - n
    kpad_half = _cdiv(k_half, bk_half) * bk_half - k_half
    if npad or kpad_half:
        w_packed = jnp.pad(w_packed, ((0, kpad_half), (0, npad)))
    rows = x.shape[0] if x.ndim == 2 else 1
    xr = x.reshape(rows, -1).astype(jnp.bfloat16)
    rpad = max(8 - rows, 0)
    x_lo = jnp.pad(xr[:, :k_half], ((0, rpad), (0, kpad_half)))
    x_hi = jnp.pad(xr[:, k_half:], ((0, rpad), (0, kpad_half)))
    # pad scale rows so each padded K-half spans n_k * nb block rows (the
    # padded weight rows are zero, so the padded scales' values are inert)
    half_b = k_half // blk
    n_k = _cdiv(k_half + kpad_half, bk_half)
    nb = bk_half // blk
    s = scale_block                                        # [K/B, N]
    bpad = n_k * nb - half_b
    if npad or bpad:
        s_lo = jnp.pad(s[:half_b], ((0, bpad), (0, npad)))
        s_hi = jnp.pad(s[half_b:], ((0, bpad), (0, npad)))
        s = jnp.concatenate([s_lo, s_hi], axis=0)
    out = _gemv_block_pallas(w_packed, x_lo, x_hi, s, bn=bn,
                             bk_half=bk_half, blk=blk,
                             interpret=interpret_mode())
    return out[:max(rows, 1), :n][:rows]
