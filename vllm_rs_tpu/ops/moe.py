"""Mixture-of-Experts routing + expert execution.

Behavioral counterpart of the reference's MoeRouting / FusedMoe*
(src/models/layers/moe.rs — routing semantics at moe.rs:69-150, grouped
GEMMs at moe.rs:550-562 etc.), redesigned for TPU:

- Routing is pure jnp (softmax or sigmoid scoring, optional e-score
  correction bias, DeepSeek group-limited top-k, top-k prob renorm and
  routed scaling) — it vectorizes on the VPU and stays inside the jitted
  step, replacing the reference's `topk_softmax` CUDA kernel.
- Expert FFN execution has three paths picked at trace time on *static*
  information (token count, weight dtype):
    * `ragged`: sort token-expert assignments, run `jax.lax.ragged_dot`
      (XLA's grouped-GEMM HLO — the megablox primitive) — prefill path for
      bf16 experts; reads each live expert's weights once.
    * `gather`: gather the selected experts' weights and run small batched
      GEMMs — decode path; for T·k tokens reads exactly the bytes of the
      selected experts, the bandwidth roofline for batch-1 MoE decode.
      Works for quantized experts (dequantizes only what it gathered).
    * `scan`: `lax.scan` over experts, dequantize one expert at a time and
      apply it to all tokens under the routing mask — quantized prefill
      path; weight traffic is optimal (each expert read once), compute is
      inflated by E/k and will move to a fused Pallas grouped quant-GEMM.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vllm_rs_tpu.quant.pack import (
    AnyQuantTensor,
    PackedInt4Tensor,
    QuantizedTensor,
    dequantize,
)


class MoERouterConfig(NamedTuple):
    """Static routing knobs (reference MoeRouting fields, moe.rs:40-65)."""

    num_experts: int
    num_experts_per_tok: int
    scoring: str = "softmax"  # "softmax" | "sigmoid"
    n_group: int = 1
    topk_group: int = 1
    norm_topk_prob: bool = True
    routed_scaling_factor: float = 1.0


def moe_route(
    router_logits: jax.Array,  # [T, E] any float
    cfg: MoERouterConfig,
    e_score_correction_bias: Optional[jax.Array] = None,  # [E]
) -> Tuple[jax.Array, jax.Array]:
    """Route tokens to experts → (topk_weights [T, k] f32, topk_ids [T, k] i32).

    Mirrors MoeRouting::route (moe.rs:69-150): sigmoid scoring selects on
    bias-corrected scores but *weights* with the raw sigmoid scores;
    group-limited selection scores each group by its top-2 sum.
    """
    logits = router_logits.astype(jnp.float32)
    T, E = logits.shape
    k = cfg.num_experts_per_tok

    if cfg.scoring == "sigmoid":
        scores = jax.nn.sigmoid(logits)
        choice = scores
        if e_score_correction_bias is not None:
            choice = scores + e_score_correction_bias.astype(jnp.float32)[None, :]
        if cfg.n_group > 1:
            assert E % cfg.n_group == 0, (E, cfg.n_group)
            epg = E // cfg.n_group
            grouped = choice.reshape(T, cfg.n_group, epg)
            # group score = sum of each group's top-2 members (moe.rs:105-109)
            top2 = jax.lax.top_k(grouped, min(2, epg))[0]
            group_scores = jnp.sum(top2, axis=-1)  # [T, n_group]
            _, group_idx = jax.lax.top_k(group_scores, cfg.topk_group)
            group_mask = jnp.zeros((T, cfg.n_group), dtype=jnp.bool_)
            group_mask = group_mask.at[
                jnp.arange(T, dtype=jnp.int32)[:, None], group_idx
            ].set(True)
            expert_mask = jnp.repeat(group_mask, epg, axis=1)
            choice = jnp.where(expert_mask, choice, -jnp.inf)
        _, topk_ids = jax.lax.top_k(choice, k)
        topk_weights = jnp.take_along_axis(scores, topk_ids, axis=1)
    else:
        choice = logits
        if e_score_correction_bias is not None:
            choice = choice + e_score_correction_bias.astype(jnp.float32)[None, :]
        # reference topk_softmax: softmax over all experts, then top-k
        probs = jax.nn.softmax(choice, axis=-1)
        topk_weights, topk_ids = jax.lax.top_k(probs, k)

    if cfg.norm_topk_prob:
        topk_weights = topk_weights / jnp.sum(topk_weights, axis=-1, keepdims=True)
    if cfg.routed_scaling_factor != 1.0:
        topk_weights = topk_weights * cfg.routed_scaling_factor
    return topk_weights, topk_ids.astype(jnp.int32)


# ---------------------------------------------------------------------------
# expert execution
# ---------------------------------------------------------------------------


def _act(gate: jax.Array, up: jax.Array, act: str) -> jax.Array:
    if act == "silu":
        return jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
    if act in ("gelu", "gelu_pytorch_tanh"):
        return jax.nn.gelu(
            gate.astype(jnp.float32), approximate=act != "gelu"
        ).astype(gate.dtype) * up
    raise ValueError(act)


def _is_quant(w) -> bool:
    return isinstance(w, (QuantizedTensor, PackedInt4Tensor))


def _gather_expert(w, ids: jax.Array):
    """Index stacked expert weights [E, ...] with flat ids [M] → [M, ...]."""
    if _is_quant(w):
        taken = type(w)(
            w.qweight[ids],
            w.scales[ids],
            w.zeros[ids] if w.zeros is not None else None,
        )
        return jax.vmap(lambda t: dequantize(t, jnp.bfloat16))(taken)
    return w[ids]


def moe_mlp_gather(
    h: jax.Array,  # [T, D]
    topk_weights: jax.Array,  # [T, k] f32
    topk_ids: jax.Array,  # [T, k] i32
    w_gate,  # [E, D, I] (dense or quantized stack)
    w_up,
    w_down,  # [E, I, D]
    act: str = "silu",
) -> jax.Array:
    """Decode path: per-(token, expert) weight gather + batched GEMV."""
    T, k = topk_ids.shape
    flat_ids = topk_ids.reshape(-1)  # [T*k]
    x = jnp.repeat(h, k, axis=0)[:, None, :].astype(jnp.bfloat16)  # [T*k, 1, D]
    g = jnp.einsum(
        "mod,mdi->moi", x, _gather_expert(w_gate, flat_ids).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    u = jnp.einsum(
        "mod,mdi->moi", x, _gather_expert(w_up, flat_ids).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    y = jnp.einsum(
        "moi,mid->mod",
        _act(g, u, act),
        _gather_expert(w_down, flat_ids).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # [T*k, 1, D] f32
    y = y.reshape(T, k, -1) * topk_weights[:, :, None]
    return jnp.sum(y, axis=1).astype(h.dtype)


def moe_mlp_ragged(
    h: jax.Array,
    topk_weights: jax.Array,
    topk_ids: jax.Array,
    w_gate: jax.Array,  # [E, D, I] dense
    w_up: jax.Array,
    w_down: jax.Array,
    act: str = "silu",
) -> jax.Array:
    """Prefill path for dense experts: sort assignments by expert, grouped
    GEMM via lax.ragged_dot (the reference's moe_gemm, moe.rs:550-562)."""
    T, k = topk_ids.shape
    E = w_gate.shape[0]
    M = T * k
    flat_ids = topk_ids.reshape(M)
    order = jnp.argsort(flat_ids)  # stable
    sorted_ids = flat_ids[order]
    token_of = order // k  # source token per sorted row
    x = h[token_of].astype(jnp.bfloat16)  # [M, D]
    group_sizes = jnp.bincount(sorted_ids, length=E).astype(jnp.int32)

    g = jax.lax.ragged_dot(x, w_gate.astype(jnp.bfloat16), group_sizes)
    u = jax.lax.ragged_dot(x, w_up.astype(jnp.bfloat16), group_sizes)
    y = jax.lax.ragged_dot(_act(g, u, act), w_down.astype(jnp.bfloat16), group_sizes)

    wts = topk_weights.reshape(M)[order].astype(jnp.float32)
    out = jnp.zeros((T, h.shape[-1]), dtype=jnp.float32)
    out = out.at[token_of].add(y.astype(jnp.float32) * wts[:, None])
    return out.astype(h.dtype)


def moe_mlp_scan(
    h: jax.Array,
    topk_weights: jax.Array,
    topk_ids: jax.Array,
    w_gate,
    w_up,
    w_down,
    act: str = "silu",
) -> jax.Array:
    """Quantized-prefill path: scan over experts, dequantize one expert at a
    time (weight traffic = each expert once), dense-apply to all tokens under
    the routing mask. Compute is inflated by E/k; a fused Pallas grouped
    quant-GEMM will replace this."""
    T, k = topk_ids.shape
    E = (w_gate.qweight if _is_quant(w_gate) else w_gate).shape[0]
    # per-token combine weight for each expert: [T, E]
    combine = jnp.zeros((T, E), dtype=jnp.float32)
    combine = combine.at[
        jnp.arange(T, dtype=jnp.int32)[:, None], topk_ids
    ].add(topk_weights, mode="drop")

    def one_expert(carry, xs):
        wg, wu, wd, cmb = xs  # cmb: [T]
        def deq(w):
            return dequantize(w, jnp.bfloat16) if _is_quant(wg) else w.astype(jnp.bfloat16)
        g = jnp.dot(h.astype(jnp.bfloat16), deq(wg), preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        u = jnp.dot(h.astype(jnp.bfloat16), deq(wu), preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        y = jnp.dot(_act(g, u, act), deq(wd), preferred_element_type=jnp.float32)
        return carry + y * cmb[:, None], None

    init = jnp.zeros((T, h.shape[-1]), dtype=jnp.float32)
    out, _ = jax.lax.scan(one_expert, init, (w_gate, w_up, w_down, combine.T))
    return out.astype(h.dtype)


def moe_mlp_indexed(
    h: jax.Array,
    topk_weights: jax.Array,
    topk_ids: jax.Array,
    w_gate,
    w_up,
    w_down,
    act: str = "silu",
):
    """Decode path for quantized experts: stream each selected expert's
    int8/int4 tiles directly (scalar-prefetched expert ids), dequantizing
    in-register — no gather/dequant materialization (2-4x less weight
    traffic than moe_mlp_gather). Returns None when unsupported."""
    from vllm_rs_tpu.ops.pallas.moe_matmul import moe_matmul_indexed

    T, k = topk_ids.shape
    flat_ids = topk_ids.reshape(-1)
    x = jnp.repeat(h, k, axis=0).astype(jnp.bfloat16)  # [T*k, D]
    g = moe_matmul_indexed(x, flat_ids, w_gate)
    if g is None:
        return None
    u = moe_matmul_indexed(x, flat_ids, w_up)
    y = moe_matmul_indexed(_act(g, u, act), flat_ids, w_down)
    if u is None or y is None:
        return None
    y = y.reshape(T, k, -1).astype(jnp.float32) * topk_weights[:, :, None]
    return jnp.sum(y, axis=1).astype(h.dtype)


def moe_mlp(
    h: jax.Array,  # [T, D]
    topk_weights: jax.Array,
    topk_ids: jax.Array,
    w_gate,
    w_up,
    w_down,
    act: str = "silu",
    *,
    gather_threshold: int = 256,
) -> jax.Array:
    """Dispatch on static shape + dtype (the analogue of the reference's
    is_prefill flag feeding FusedMoe, linear.rs:20-45)."""
    T, k = topk_ids.shape
    if T * k <= gather_threshold:
        if _is_quant(w_gate) and T * k <= 64 and jax.default_backend() == "tpu":
            y = moe_mlp_indexed(
                h, topk_weights, topk_ids, w_gate, w_up, w_down, act
            )
            if y is not None:
                return y
        return moe_mlp_gather(h, topk_weights, topk_ids, w_gate, w_up, w_down, act)
    if _is_quant(w_gate):
        return moe_mlp_scan(h, topk_weights, topk_ids, w_gate, w_up, w_down, act)
    return moe_mlp_ragged(h, topk_weights, topk_ids, w_gate, w_up, w_down, act)


def moe_mlp_reference(
    h: jax.Array,
    topk_weights: jax.Array,
    topk_ids: jax.Array,
    w_gate,
    w_up,
    w_down,
    act: str = "silu",
) -> jax.Array:
    """Dense one-hot dispatch — ground truth for tests."""
    T, k = topk_ids.shape
    deq = lambda w: (  # noqa: E731
        jax.vmap(lambda t: dequantize(t))(w) if _is_quant(w) else w
    )
    wg, wu, wd = deq(w_gate), deq(w_up), deq(w_down)
    E = wg.shape[0]
    out = jnp.zeros((T, h.shape[-1]), dtype=jnp.float32)
    for e in range(E):
        g = jnp.dot(h.astype(jnp.bfloat16), wg[e].astype(jnp.bfloat16), preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        u = jnp.dot(h.astype(jnp.bfloat16), wu[e].astype(jnp.bfloat16), preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        y = jnp.dot(_act(g, u, act), wd[e].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        cmb = jnp.sum(
            jnp.where(topk_ids == e, topk_weights, 0.0), axis=-1
        )  # [T]
        out = out + y * cmb[:, None]
    return out.astype(h.dtype)
