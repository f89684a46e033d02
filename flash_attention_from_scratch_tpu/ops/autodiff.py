"""Differentiable wrapper around the flash forward kernel.

The reference implements the forward pass only (``README.md:7-16``); training
support is an extension. Until the dedicated Pallas backward kernel lands,
the VJP recomputes attention with the pure-jnp reference and differentiates
that — mathematically identical gradients (attention is deterministic), with
the kernel still providing the fast primal. Pattern per the custom-VJP recipe
in the Pallas guide.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .configs import KernelConfig
from .flash_forward import flash_forward
from .reference import reference_attention

__all__ = ["flash_attention"]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, cfg: KernelConfig | None = None,
                    interpret: bool | None = None):
    """Differentiable flash attention: kernel primal, recompute VJP."""
    return flash_forward(q, k, v, cfg, interpret=interpret)


def _fwd(q, k, v, cfg, interpret):
    return flash_forward(q, k, v, cfg, interpret=interpret), (q, k, v)


def _bwd(cfg, interpret, residuals, g):
    q, k, v = residuals
    causal = cfg.causal if cfg is not None else False

    def ref(q, k, v):
        return reference_attention(q, k, v, causal=causal)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
