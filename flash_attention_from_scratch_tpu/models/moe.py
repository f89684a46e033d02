"""Mixture-of-Experts Llama variant with expert parallelism.

New TPU-first model family (the reference is a single attention kernel with
no model — SURVEY.md §0): the Llama block with its SwiGLU MLP replaced by a
top-k routed expert layer, built the idiomatic TPU way — **capacity-based
dense dispatch** (GShard/Switch style). Routing produces static-shape
dispatch/combine tensors and the expert FFN runs as one batched einsum over
all experts, so everything stays on the MXU with shapes known at trace
time; tokens over an expert's capacity are dropped (their other top-k
routes still carry them), which is the standard static-shape trade.

Expert parallelism is pure sharding: stacked expert weights carry a leading
(n_experts,) dim annotated ``P("ep", ...)`` (``moe_param_specs``), and GSPMD
inserts the all-to-alls on the dispatch/combine einsums. No hand-written
collectives — the scaling-book recipe.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..ops.quant_matmul import spmd_safe as _spmd_safe_quant
from .llama import (
    LlamaConfig, _attention, _dense_init, init_params, rms_norm, rope_tables,
)

__all__ = ["MoEConfig", "init_moe_params", "moe_forward", "moe_loss_fn",
           "EXPERT_AXIS", "moe_param_specs", "shard_moe_params"]

EXPERT_AXIS = "ep"


@dataclasses.dataclass(frozen=True)
class MoEConfig(LlamaConfig):
    n_experts: int = 8
    expert_top_k: int = 2
    # Per-expert slot budget = ceil(top_k * tokens / n_experts) * this.
    capacity_factor: float = 1.25
    # Switch-transformer aux loss weight (load balancing).
    router_aux_weight: float = 0.01


def init_moe_params(cfg: MoEConfig, key) -> dict:
    """Llama params with each layer's MLP replaced by router + experts.

    Expert weights are stacked on a leading (n_experts,) axis — the axis
    expert parallelism shards.
    """
    base_key, moe_key = jax.random.split(key)
    params = init_params(cfg, base_key)
    dt = cfg.dtype.jnp_dtype
    keys = jax.random.split(moe_key, cfg.n_layers)
    for li, layer in enumerate(params["layers"]):
        for k in ("w_gate", "w_up", "w_down"):
            del layer[k]
        k = jax.random.split(keys[li], 4)
        e, d, h = cfg.n_experts, cfg.dim, cfg.hidden_dim
        # Router stays fp32: tiny, and routing decisions are precision-
        # sensitive (a bf16 tie flips which expert a token visits).
        layer["router"] = _dense_init(k[0], (d, e), jnp.float32)

        def stacked(key, shape, fan_in):
            return (jax.random.normal(key, shape, jnp.float32)
                    / math.sqrt(fan_in)).astype(dt)

        layer["experts"] = {
            "w_gate": stacked(k[1], (e, d, h), d),
            "w_up": stacked(k[2], (e, d, h), d),
            "w_down": stacked(k[3], (e, h, d), h),
        }
    return params


def _capacity(cfg: MoEConfig, n_tokens: int) -> int:
    cap = math.ceil(cfg.expert_top_k * n_tokens / cfg.n_experts
                    * cfg.capacity_factor)
    # Lane-friendly slot count; also guarantees >= 8 so tiny test shapes
    # don't round capacity below one sublane tile.
    return max(8, cap + (-cap) % 8)


def _route(cfg: MoEConfig, gates, capacity: int):
    """Top-k capacity-based dispatch/combine (GShard algorithm).

    gates: (T, E) softmax router probabilities.
    Returns (dispatch (T, E, C) 0/1, combine (T, E, C) fp32, aux_loss).
    Slot priority is routing rank: all tokens' first choices claim
    capacity before any second choice, matching the reference MoE stacks.
    """
    t, e = gates.shape
    top_vals, top_idx = jax.lax.top_k(gates, cfg.expert_top_k)  # (T, k)
    # Renormalize the kept routes so combine weights sum to 1 per token.
    top_vals = top_vals / jnp.maximum(
        jnp.sum(top_vals, axis=-1, keepdims=True), 1e-9)

    dispatch = jnp.zeros((t, e, capacity), jnp.float32)
    combine = jnp.zeros((t, e, capacity), jnp.float32)
    counts = jnp.zeros((e,), jnp.int32)
    for j in range(cfg.expert_top_k):
        onehot = jax.nn.one_hot(top_idx[:, j], e, dtype=jnp.int32)  # (T, E)
        pos = jnp.cumsum(onehot, axis=0) - 1 + counts[None, :]
        counts = counts + jnp.sum(onehot, axis=0)
        keep = (pos < capacity) & (onehot > 0)
        slot = jax.nn.one_hot(jnp.clip(pos, 0, capacity - 1), capacity,
                              dtype=jnp.float32) * keep[..., None]
        dispatch = dispatch + slot
        combine = combine + slot * top_vals[:, j][:, None, None]

    # Switch aux loss: E * sum_e f_e * p_e — f from *first* choices.
    first = jax.nn.one_hot(top_idx[:, 0], e, dtype=jnp.float32)
    frac_routed = jnp.mean(first, axis=0)
    frac_prob = jnp.mean(gates, axis=0)
    aux = e * jnp.sum(frac_routed * frac_prob)
    return dispatch, combine, aux


def _moe_mlp(cfg: MoEConfig, layer, x):
    """Routed SwiGLU experts. x: (B, S, D) -> (out (B, S, D), aux_loss)."""
    b, s, d = x.shape
    xt = x.reshape(b * s, d)
    logits = xt.astype(jnp.float32) @ layer["router"]
    gates = jax.nn.softmax(logits, axis=-1)
    capacity = _capacity(cfg, b * s)
    dispatch, combine, aux = _route(cfg, gates, capacity)

    # Dispatch -> per-expert token batches; FFN batched over experts; the
    # (e, ...) operands/results are what "ep" shards.
    xe = jnp.einsum("tec,td->ecd", dispatch.astype(x.dtype), xt)
    w = layer["experts"]
    gate = jnp.einsum("ecd,edh->ech", xe, w["w_gate"])
    up = jnp.einsum("ecd,edh->ech", xe, w["w_up"])
    hidden = (jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up)
    ye = jnp.einsum("ech,ehd->ecd", hidden, w["w_down"])
    out = jnp.einsum("tec,ecd->td", combine.astype(x.dtype), ye)
    return out.reshape(b, s, d), aux


@_spmd_safe_quant
def moe_forward(params, tokens, cfg: MoEConfig, interpret=None, mesh=None):
    """tokens (batch, seq) -> (logits (batch, seq, vocab) fp32, aux_loss)."""
    x = params["embed"][tokens]
    cos, sin = rope_tables(tokens.shape[1], cfg.d_head, cfg.rope_theta,
                           cfg=cfg)
    aux_total = 0.0
    for li, layer in enumerate(params["layers"]):
        x = x + _attention(layer, rms_norm(x, layer["attn_norm"], cfg.norm_eps),
                           cfg, cos, sin, interpret=interpret, mesh=mesh,
                           li=li)
        h, aux = _moe_mlp(cfg, layer, rms_norm(x, layer["mlp_norm"], cfg.norm_eps))
        x = x + h
        aux_total = aux_total + aux
    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return logits, aux_total / cfg.n_layers


def moe_loss_fn(params, tokens, cfg: MoEConfig, interpret=None, mesh=None):
    """Next-token cross-entropy + router load-balancing aux loss."""
    logits, aux = moe_forward(params, tokens[:, :-1], cfg,
                              interpret=interpret, mesh=mesh)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return jnp.mean(nll) + cfg.router_aux_weight * aux


def moe_param_specs(params) -> dict:
    """PartitionSpecs: experts over "ep", everything else replicated.

    Composes with the (dp, tp) specs in ``parallel.mesh.llama_param_specs``
    when the attention/dense side should also shard; for a pure
    data+expert-parallel run these specs alone suffice — GSPMD turns the
    dispatch/combine einsums into all-to-alls over the ep axis.
    """
    from jax.sharding import PartitionSpec as P

    def leaf_spec(path, _):
        names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if "experts" in names:
            return P(EXPERT_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def shard_moe_params(params, mesh):
    from jax.sharding import NamedSharding

    specs = moe_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
