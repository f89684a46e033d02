"""Differentiable flash attention: Pallas forward + Pallas backward.

The reference implements the forward pass only (``README.md:7-16``); training
support is an extension. The VJP follows the FA2 recipe: the forward saves
only (O, LSE) — O(seq) residual memory — and the backward kernels in
``flash_backward.py`` recompute S/P blockwise on the MXU. GQA shapes
differentiate natively (dK/dV accumulate over the Q-head group inside the
dKV kernel); sliding windows (Mistral), logit softcaps (Gemma-2), and
offset-causal chunks differentiate through the same masks/bends the forward
applies.
"""

from __future__ import annotations

from functools import partial

from .configs import DType, KernelConfig, KVLoop
from .flash_backward import flash_backward
from .flash_forward import flash_forward, flash_forward_with_lse

import jax

__all__ = ["flash_attention"]


def _resolve(q, k, cfg: KernelConfig | None) -> KernelConfig:
    if cfg is not None:
        return cfg
    return KernelConfig.for_shape(
        q.shape[2], k.shape[2], dtype=DType.from_jnp(q.dtype), d_head=q.shape[-1],
    )


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, cfg: KernelConfig | None = None,
                    interpret: bool | None = None):
    """Differentiable flash attention (kernel forward and backward)."""
    return flash_forward(q, k, v, cfg, interpret=interpret)


def _fwd(q, k, v, cfg, interpret):
    rcfg = _resolve(q, k, cfg)
    if rcfg.kv_loop != KVLoop.GRID:
        # The residual (LSE) path is only built for the pipelined GRID
        # variant; FORI exists for ladder comparisons, not training.
        import dataclasses

        rcfg = dataclasses.replace(rcfg, kv_loop=KVLoop.GRID)
    out, lse = flash_forward_with_lse(q, k, v, rcfg, interpret=interpret)
    return out, (q, k, v, out, lse)


def _bwd(cfg, interpret, residuals, g):
    q, k, v, out, lse = residuals
    rcfg = _resolve(q, k, cfg)
    dq, dk, dv = flash_backward(q, k, v, out, lse, g, rcfg, interpret=interpret)
    return dq, dk, dv


flash_attention.defvjp(_fwd, _bwd)
