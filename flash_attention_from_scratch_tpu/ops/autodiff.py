"""Differentiable flash attention: Pallas forward + Pallas backward.

The reference implements the forward pass only (``README.md:7-16``); training
support is an extension. The VJP follows the FA2 recipe: the forward saves
only (O, LSE) — O(seq) residual memory — and the backward kernels in
``flash_backward.py`` recompute S/P blockwise on the MXU. GQA shapes
differentiate natively (dK/dV accumulate over the Q-head group inside the
dKV kernel); sliding windows (Mistral), logit softcaps (Gemma-2),
offset-causal chunks, and attention sinks (GPT-OSS) differentiate through
the same masks/bends the forward applies.

Sinks need no kernel change: the forward's LSE residual includes the sink
term (``flash_forward._sink_merge``), so the recomputed
``P = exp(s - lse)`` rows sum to ``1 - sink_weight`` exactly as in the
forward — the standard dS = P * (dP - D) identity still holds because
``D = rowsum(dO * O)`` equals ``sum_j P_j dP_j`` with or without the sink
(the sink carries no value, so it contributes to neither O nor D). The
sink's own gradient is the one extra term, computed with one fused XLA
pass: ``d(z_h) = -sum_{b,r} exp(z_h - lse) * D``.
"""

from __future__ import annotations

from functools import partial

from .configs import DType, KernelConfig
from .flash_backward import flash_backward
from .flash_forward import flash_forward, flash_forward_with_lse

import jax
import jax.numpy as jnp

__all__ = ["flash_attention"]


def _resolve(q, k, cfg: KernelConfig | None) -> KernelConfig:
    if cfg is not None:
        return cfg
    return KernelConfig.for_shape(
        q.shape[2], k.shape[2], dtype=DType.from_jnp(q.dtype), d_head=q.shape[-1],
    )


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, cfg: KernelConfig | None = None,
                    interpret: bool | None = None, sinks=None):
    """Differentiable flash attention (kernel forward and backward).

    ``sinks`` (optional, (heads,) fp32): GPT-OSS-style per-head attention
    sink logits — a learned parameter, differentiated alongside q/k/v.
    """
    return flash_forward(q, k, v, cfg, interpret=interpret, sinks=sinks)


def _fwd(q, k, v, cfg, interpret, sinks):
    rcfg = _resolve(q, k, cfg)
    out, lse = flash_forward_with_lse(q, k, v, rcfg, interpret=interpret,
                                      sinks=sinks)
    return out, (q, k, v, out, lse, sinks)


def _bwd(cfg, interpret, residuals, g):
    q, k, v, out, lse, sinks = residuals
    rcfg = _resolve(q, k, cfg)
    dq, dk, dv = flash_backward(q, k, v, out, lse, g, rcfg, interpret=interpret)
    if sinks is None:
        return dq, dk, dv, None
    # d(sink): the sink's softmax weight is w = exp(z - lse) per row; the
    # sink contributes no value, so dS_sink = w * (0 - D) with
    # D = rowsum(dO * O), summed over every row the head attends.
    d_row = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    w = jnp.exp(sinks.astype(jnp.float32)[None, :, None] - lse)  # (b, h, s)
    dsinks = -jnp.sum(w * d_row, axis=(0, 2)).astype(sinks.dtype)
    return dq, dk, dv, dsinks


flash_attention.defvjp(_fwd, _bwd)
