"""Parameter and KV-cache shardings (tensor parallelism).

The TP plan mirrors the reference's distributed.rs wrappers:
- q/k/v, gate/up: column-parallel — shard the output dim
  (TensorParallelColumnLinear, distributed.rs:54)
- o, down: row-parallel — shard the input dim; XLA inserts the all-reduce
  the reference issues manually (distributed.rs:300, 438-455)
- KV cache: kv-head axis sharded (kv_head_shard, distributed.rs:498-538)
- norms, embedding, lm_head: replicated (llama.rs:226-245)

Quantized tensors shard qweight/scales/zeros with the same logical spec
(group axis K//G follows K).

GSPMD guarantees correctness regardless of these hints; they exist to pin
the *fast* layout so collectives ride ICI exactly once per o/down proj.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# module name → (dense weight spec, bias spec) for stacked [L, K, N] weights
_COL = (P(None, None, "model"), P(None, "model"))
_ROW = (P(None, "model", None), P(None))
_PLANS = {
    "qkv": _COL,
    "gate_up": _COL,
    "q": _COL,
    "k": _COL,
    "v": _COL,
    "gate": _COL,
    "up": _COL,
    "o": _ROW,
    "down": _ROW,
    # MoE shared expert (qwen3_moe.rs loaders shard the same TP dim)
    "shared_gate_proj": _COL,
    "shared_up_proj": _COL,
    "shared_down_proj": _ROW,
    # llama4 fused shared expert (models/llama4.py)
    "shared_gate_up": _COL,
    "shared_down": _ROW,
    # MLA projections: q (direct or LoRA-B) col-parallel, absorbed factors
    # sharded on the head axis (kv_b head shards, mla_attention.rs)
    "q_b": _COL,
    "in_qkvz": _COL,  # GDN fused projection
    "out": _ROW,  # GDN output projection
}
# stacked expert weights [L, E, K, N]: experts replicated, K/N TP-sharded
_EXPERT_COL = P(None, None, None, "model")
_EXPERT_ROW = P(None, None, "model", None)
_MOE_PLANS = {"w_gate": _EXPERT_COL, "w_up": _EXPERT_COL, "w_down": _EXPERT_ROW}
# MLA absorbed factors [L, H, dn, R] / [L, H, R, dv]: shard heads
_HEAD_SHARD = P(None, "model", None, None)
_MLA_PLANS = {"w_uk": _HEAD_SHARD, "w_uv": _HEAD_SHARD}


def _leaf_name(path) -> str:
    """Innermost dict key along a tree path."""
    names = [p.key for p in path if isinstance(p, jax.tree_util.DictKey)]
    return names[-1] if names else ""


def _field_name(path) -> str:
    last = path[-1]
    if hasattr(last, "name"):
        return last.name
    if hasattr(last, "idx"):
        return str(last.idx)
    return ""


def param_spec(path, leaf) -> P:
    name = _leaf_name(path)
    if name in _MOE_PLANS and leaf.ndim == 4:
        return _MOE_PLANS[name]
    if name in _MOE_PLANS and leaf.ndim == 3:  # unstacked [E, K, N]
        s = _MOE_PLANS[name]
        return P(s[1], s[2], s[3])
    if name in _MLA_PLANS and leaf.ndim == 4:
        return _MLA_PLANS[name]
    plan = _PLANS.get(name)
    if plan is None:
        return P()  # replicated: norms, embed, lm_head, inv_freq, router
    wspec, bspec = plan
    field = _field_name(path)
    # NamedTuple fields: Linear(w, b) / QuantizedTensor(qweight, scales, zeros)
    if field in ("b", "1") and leaf.ndim == 2:
        return bspec
    if leaf.ndim == 3:
        return wspec  # dense w, qweight, or [L, K//G, N] scales/zeros
    if leaf.ndim == 2:
        return P(wspec[1], wspec[2])  # unstacked single-layer weight
    return P()


def shard_params(params: Any, mesh: Mesh) -> Any:
    def place(path, leaf):
        spec = param_spec(path, leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def kv_spec(num_kv_heads: int, mesh: Mesh) -> P:
    """Shard the flattened kv-head axis (dim 3 of [L, 2, S, Hk*D]) when the
    head count divides the model axis; otherwise replicate (kv_heads <
    world_size case, distributed.rs:498-538)."""
    tp = mesh.shape.get("model", 1)
    if tp > 1 and num_kv_heads % tp == 0:
        return P(None, None, None, "model")
    return P()


def shard_kv_cache(kv, mesh: Mesh, num_kv_heads: int, head_counts=None):
    """Shard the cache on the kv-head axis where the layout has one.

    - GQA [L, 2, S, Hk*D] (and int8 scales [L, 2, S, Hk]): shard dim 3.
    - MLA latent [L, S, R+P]: replicated — the compressed latent is shared
      across heads (heads shard in w_uk/w_uv instead).
    - hybrid GDN conv/rec state: replicated (per-slot recurrent state).
    - heterogeneous pools (gemma4 {"swa","full"}): `head_counts` maps pool
      key → kv-head count so each pool sharding respects its own geometry
      (the reference's per-layer kv_head_shard analog, distributed.rs:498).
    """
    head_spec = kv_spec(num_kv_heads, mesh)

    def place(path, leaf):
        # the GQA pool signature is [L, 2, S, *]; anything else replicates
        is_gqa = leaf.ndim == 4 and leaf.shape[1] == 2
        spec = head_spec if is_gqa else P()
        if is_gqa and head_counts:
            key = _leaf_name(path)
            if key in head_counts:
                spec = kv_spec(head_counts[key], mesh)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, kv)
