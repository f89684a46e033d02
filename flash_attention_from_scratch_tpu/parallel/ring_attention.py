"""Ring attention: sequence-parallel flash attention over an ICI ring.

New TPU-first subsystem (the reference is single-GPU; SURVEY.md §5.7):
sequences longer than one chip's HBM shard across a mesh axis, and K/V
shards rotate around the ring with ``ppermute`` while every device runs the
single-chip Pallas kernel on its resident Q shard. XLA's latency-hiding
scheduler overlaps the collective with the kernel of the previous step.

Partial results merge through the kernel's LSE residual — the same
log-sum-exp algebra the online softmax uses within a kernel, applied across
devices:

    m = max(lse_a, lse_b);  w = exp(lse - m)
    o = (o_a w_a + o_b w_b) / (w_a + w_b);  lse = m + log(w_a + w_b)

Causal handling without a zigzag relayout: at ring step 0 every device
attends its own K/V shard with the causal kernel; at step t > 0 device i
holds the shard that originated at ``i - t (mod P)``, which lies strictly
in the past iff ``i >= t`` — so the step's contribution is merged with its
LSE masked to -inf on devices where it is future. No per-device control
flow, just an elementwise select on the merge weights.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.configs import KernelConfig, KVLoop
from ..ops.flash_forward import flash_forward_with_lse

__all__ = ["ring_flash_attention"]

_NEG = -1e30


def _merge(o_a, lse_a, o_b, lse_b):
    """LSE-weighted merge of two normalized partial attentions (fp32 o)."""
    m = jnp.maximum(lse_a, lse_b)
    w_a = jnp.exp(lse_a - m)
    w_b = jnp.exp(lse_b - m)
    denom = w_a + w_b
    o = (o_a * w_a[..., None] + o_b * w_b[..., None]) / denom[..., None]
    return o, m + jnp.log(denom)


def ring_flash_attention(q, k, v, cfg: KernelConfig, mesh: Mesh,
                         axis: str = "sp", *, causal: bool | None = None,
                         interpret: bool | None = None):
    """Flash attention with Q/K/V sequence-sharded over ``mesh[axis]``.

    Inputs are global (batch, heads, seq, d_head) arrays; seq is sharded
    over ``axis`` and must divide evenly. ``causal`` defaults to
    ``cfg.causal``. Returns the global attention output, seq-sharded the
    same way.
    """
    if causal is None:
        causal = cfg.causal
    n_shards = mesh.shape[axis]
    base = dataclasses.replace(cfg, causal=False, kv_loop=KVLoop.GRID)
    diag = dataclasses.replace(base, causal=causal)
    spec = P(None, None, axis, None)
    perm = [(j, (j + 1) % n_shards) for j in range(n_shards)]

    @partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
             out_specs=spec, check_rep=False)
    def _ring(q, k, v):
        idx = jax.lax.axis_index(axis)
        # Step 0: own shard (the causal diagonal block when causal).
        o, lse = flash_forward_with_lse(q, k, v, diag, interpret=interpret)
        o = o.astype(jnp.float32)
        kk, vv = k, v
        for t in range(1, n_shards):
            kk = jax.lax.ppermute(kk, axis, perm)
            vv = jax.lax.ppermute(vv, axis, perm)
            o_t, lse_t = flash_forward_with_lse(q, kk, vv, base,
                                                interpret=interpret)
            if causal:
                # Shard now held originated at idx - t (mod P): strictly in
                # the past iff idx >= t; otherwise mask it out of the merge.
                lse_t = jnp.where(idx >= t, lse_t, _NEG)
            o, lse = _merge(o, lse, o_t.astype(jnp.float32), lse_t)
        return o.astype(q.dtype)

    return _ring(q, k, v)
