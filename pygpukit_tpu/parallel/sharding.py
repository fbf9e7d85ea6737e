"""Sharding rules for the causal transformer param pytree.

Megatron-style tensor parallelism expressed as NamedShardings over the
stacked-layer pytree (leading axis = layer, never sharded):

  w_q/w_k/w_v [L, E, H*D]  → (None, None, "tp")   column parallel
  w_o         [L, H*D, E]  → (None, "tp", None)   row parallel
  w_gate/w_up [L, E, I]    → (None, None, "tp")
  w_down      [L, I, E]    → (None, "tp", None)
  lm_head     [E, V]       → (None, "tp")
  embeddings / norms       → replicated

XLA inserts the all-reduce after row-parallel matmuls automatically from
these layouts (the "let the compiler insert collectives" recipe).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COL = {"w_q", "w_k", "w_v", "w_gate", "w_up", "w_fc1",
        "w_experts_gate", "w_experts_up"}
_ROW = {"w_o", "w_down", "w_fc2", "w_experts_down"}
_BIAS_COL = {"b_q", "b_k", "b_v", "b_fc1"}


def _layer_spec(name: str, ndim: int) -> P:
    # all stacked-layer leaves have a leading L axis
    if name in _COL:
        return P(*([None] * (ndim - 1) + ["tp"]))
    if name in _ROW:
        return P(*([None] * (ndim - 2) + ["tp", None]))
    if name in _BIAS_COL:
        return P(*([None] * (ndim - 1) + ["tp"]))
    return P(*([None] * ndim))


def _packed_leaf_spec(name: str, leaf: dict) -> dict:
    """Packed-int4 dict specs: cut the quantized weight along its OUT axis
    for column-parallel names (q/k/v/gate/up) and its packed-K axis for
    row-parallel names (o/down), scales cut to match. Layouts
    (llm/quant.quantize_weight): plain int4 q_packed [..., N, K/2]
    (transposed), scale [..., 1, N]; int4_block K-major q_packed
    [..., K/2, N], scale_block/_lo/_hi [..., K/B', N].

    Row cuts shard the packed K/2 axis: the split-half nibble unpack
    concatenates lo|hi along K, so each device's shard covers matching
    K-positions in both halves and GSPMD all-reduces the cut contraction.
    TP-sharded captures route _mm to the XLA dequant dot — the stacked
    Pallas GEMV is a single-chip kernel (model shard_model sets
    xla_mm_only; serving engines capture vmapped+batched_trace under a
    mesh), so GSPMD only ever partitions plain dots here."""
    col = name in _COL or name in _BIAS_COL
    row = name in _ROW
    blocked = "scale_block" in leaf
    out = {}
    for kk, vv in leaf.items():
        nd = vv.ndim
        spec = [None] * nd
        if col:
            if kk == "q_packed" and not blocked:
                spec[nd - 2] = "tp"        # N axis of [..., N, K/2]
            else:
                spec[nd - 1] = "tp"        # trailing N: scales + blocked q
        elif row:
            if kk == "q_packed":
                spec[(nd - 1) if not blocked else (nd - 2)] = "tp"  # K/2
            # scales replicated on row cuts: per-column ("scale") spans the
            # un-cut out axis, and blocked scale K/B axes can be smaller
            # than tp (scales are ~12% of the packed bytes — replication
            # costs little and dodges divisibility pitfalls; GSPMD aligns
            # the dequant multiply either way)
        out[kk] = P(*spec)
    return out


def _leaf_spec(name: str, leaf) -> P | dict:
    """Spec for one layer leaf; quantized {"q","scale"} dicts shard ``q``
    like the dense weight would be and cut per-column scales the same way
    along their trailing (out) axis; packed-int4 dicts cut via
    _packed_leaf_spec."""
    if not isinstance(leaf, dict):
        return _layer_spec(name, leaf.ndim)
    if "q_packed" in leaf:
        if name in _COL | _ROW | _BIAS_COL:
            return _packed_leaf_spec(name, leaf)
        return {kk: P(*([None] * vv.ndim)) for kk, vv in leaf.items()}
    if "q" not in leaf:
        return {kk: P(*([None] * vv.ndim)) for kk, vv in leaf.items()}
    qspec = _layer_spec(name, leaf["q"].ndim)
    col = len(qspec) > 0 and qspec[-1] == "tp"
    out = {}
    for kk, vv in leaf.items():
        if kk == "q":
            out[kk] = qspec
        elif col and vv.ndim >= 1 and vv.shape[-1] == leaf["q"].shape[-1]:
            out[kk] = P(*([None] * (vv.ndim - 1) + ["tp"]))
        else:
            out[kk] = P(*([None] * vv.ndim))
    return out


def param_specs(params: dict, ep: bool = False) -> dict:
    """PartitionSpec pytree matching ``params`` (model.py layout).

    ``ep``: EXPERT parallelism — shard the expert axis of the stacked MoE
    leaves ``w_experts_*`` [L, E, in, out] over "tp" instead of Megatron
    column/row-cutting their matmul dims (each device holds E/tp whole
    experts; the decode-sized gather path reads only the owning shards and
    GSPMD inserts the combine). Quantized expert stacks ({"q": [L,E,in,out],
    "scale": [L,E,1,out]}) EP-shard the expert axis of every member."""
    def _ep_spec(leaf):
        if isinstance(leaf, dict):
            return {kk: P(*([None, "tp"] + [None] * (vv.ndim - 2)))
                    for kk, vv in leaf.items()}
        return P(None, "tp", None, None)

    def _ep_eligible(leaf):
        if isinstance(leaf, dict):
            return all(vv.ndim == 4 for vv in leaf.values())
        return leaf.ndim == 4

    specs: dict = {}
    for k, v in params.items():
        if k == "layers":
            specs[k] = {name: (_ep_spec(leaf)
                               if ep and name.startswith("w_experts")
                               and _ep_eligible(leaf)
                               else _leaf_spec(name, leaf))
                        for name, leaf in v.items()}
        elif k == "lm_head" and v is not None:
            if isinstance(v, dict) and "q_packed" in v:
                # packed-int4 head: plain layout [V, E/2] cuts vocab on the
                # leading axis; K-major int4_block [E/2, V] and all scales
                # cut vocab on the trailing axis
                blocked = "scale_block" in v
                specs[k] = {kk: (P("tp", None)
                                 if kk == "q_packed" and not blocked
                                 else P(*([None] * (vv.ndim - 1) + ["tp"])))
                            for kk, vv in v.items()}
            elif isinstance(v, dict):
                specs[k] = {kk: (P(None, "tp") if vv.ndim == 2
                                 else P(*([None] * vv.ndim)))
                            for kk, vv in v.items()}
            else:
                specs[k] = P(None, "tp")
        elif v is None:
            specs[k] = None
        elif isinstance(v, dict):
            specs[k] = {kk: P(*([None] * vv.ndim)) for kk, vv in v.items()}
        else:
            specs[k] = P(*([None] * v.ndim))
    return specs


def shard_params(params: dict, mesh: Mesh, ep: bool = False) -> dict:
    """Place ``params`` onto the mesh with TP (and optionally EP) shardings."""
    specs = param_specs(params, ep=ep)

    def place(leaf, spec):
        if leaf is None:
            return None
        if isinstance(leaf, dict):
            return {kk: place(vv, spec[kk]) for kk, vv in leaf.items()}
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    out = {}
    for k, v in params.items():
        if k == "layers":
            out[k] = {n: place(leaf, specs[k][n]) for n, leaf in v.items()}
        else:
            out[k] = place(v, specs[k]) if v is not None else None
    return out


def cache_specs(ndim: int = 4) -> P:
    """KV cache [L, MAX, Hk, D] → shard kv heads over tp."""
    return P(None, None, "tp", None)


def shard_model(model, mesh: Mesh, ep: bool = False):
    """Place a CausalTransformerModel's params on a mesh with TP shardings
    (``ep=True``: MoE expert stacks sharded along the expert axis instead —
    expert parallelism over the same "tp" mesh axis).

    Forward/decode executables then compile as GSPMD-partitioned programs —
    XLA inserts the all-reduces after row-parallel matmuls. Re-capture of the
    model's executables happens lazily (they key on input shardings).
    """
    model.params = shard_params(model.params, mesh, ep=ep)
    # sharded params: captures must keep _mm on plain XLA dots (GSPMD
    # partitions those; the single-chip Pallas GEMV/GEMM kernels would be
    # replicated with all-gathered weight stacks)
    model.xla_mm_only = True
    model._decode_exe = None
    model._prefill_exes = {}
    model._window_exes = {}
    model._gen_exes = {}
    return model


#: hybrid/standalone family projection names with a Megatron column/row TP
#: layout (trailing out-axis / penultimate in-axis). Mixer/recurrent leaves
#: (conv kernels, SSM decay/state params, DeltaNet projections) and norms
#: stay replicated — their per-head state layouts are family-specific and
#: tiny next to the MLP/attention matmuls these specs cut.
#: ``w_in`` (Mamba/LFM2 mixer in-proj [E, n*d_inner]) cuts column-wise —
#: the conv/SSM channel states it feeds are elementwise per channel, so
#: GSPMD keeps them sharded alongside; ``w_out`` (mixer/attention out-proj
#: [d_inner, E]) is the matching row cut.
_HYBRID_COL = {"w_gate", "w_up", "w_q", "w_k", "w_v", "w_in",
               "shared_w_gate", "shared_w_up"}
_HYBRID_ROW = {"w_o", "w_down", "w_out", "shared_w_down"}


def shard_hybrid_model(model, mesh: Mesh):
    """Name-based TP placement for a StandaloneCachedModel (Mamba / LFM2 /
    Qwen3-Next): attention q/k/v and MLP gate/up column-parallel, o/down
    row-parallel, everything else (recurrent mixers, norms, embeddings)
    replicated. The serving/chunk executables then compile as GSPMD
    programs over the mesh (llm/serving_hybrid.HybridServingEngine mesh=)."""
    def place(name, leaf):
        if leaf is None or not hasattr(leaf, "ndim"):
            return leaf
        nd = leaf.ndim
        if name in _HYBRID_COL and nd >= 2:
            spec = P(*([None] * (nd - 1) + ["tp"]))
        elif name in _HYBRID_ROW and nd >= 2:
            spec = P(*([None] * (nd - 2) + ["tp", None]))
        else:
            spec = P(*([None] * nd))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    def walk(tree, name=""):
        if isinstance(tree, dict):
            return {k: walk(v, k) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(walk(v, name) for v in tree)
        return place(name, tree)

    model.params = walk(model.params)
    model._prefill_exes = {}
    model._gen_exes = {}
    return model
