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

Sliding windows compose: hop t's KV columns sit exactly ``t * shard_len``
behind the Q rows on every participating device, so the hop runs the
single-chip kernel with ``q_offset = t * shard_len`` and the window mask —
and hops entirely below the window are never run at all (``_max_hop``), so
a window much shorter than the global sequence shortens the ring.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.configs import KernelConfig, KVLoop
from ..ops.flash_backward import flash_backward
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
                         interpret: bool | None = None, sinks=None):
    """Flash attention with Q/K/V sequence-sharded over ``mesh[axis]``.

    Inputs are global (batch, heads, seq, d_head) arrays; seq is sharded
    over ``axis`` and must divide evenly. ``causal`` defaults to
    ``cfg.causal``. Returns the global attention output, seq-sharded the
    same way. Differentiable: the backward runs its own ring (see
    ``_ring_bwd``).

    ``sinks`` ((heads,) fp32, optional, differentiable): per-head
    attention-sink logits, replicated over the ring axis. The ring's hops
    stay sink-free; the sink joins the merged global LSE exactly once,
    post-ring (the same logaddexp fold the single-chip decomposed dispatch
    uses) — so every device's rows carry the sink-inclusive LSE and the
    backward's recomputed P is globally exact.
    """
    from .mesh import mesh_interpret

    interpret = mesh_interpret(mesh, interpret)
    if causal is None:
        causal = cfg.causal
    if cfg.q_offset:
        # A global q_offset would shift every shard's alignment; no model
        # path needs it composed with a ring. (attn_softcap is fine: it is
        # elementwise on the scores and rides each hop's partial. A sliding
        # window is handled per hop — see _hop_cfg/_max_hop.)
        raise NotImplementedError(
            f"ring attention with q_offset (got {cfg.q_offset})")
    if cfg.window and not causal:
        raise ValueError("window requires causal (config invariant)")
    return _ring_attention(q, k, v, sinks, cfg, mesh, axis, causal,
                           interpret)


def _max_hop(window: int, shard_len: int, n_shards: int) -> int:
    """Number of ring hops that can contribute under a sliding window.

    Hop t pairs Q rows with KV columns exactly ``t * shard_len`` behind;
    the closest pair of hop t is ``t*L - (L-1)`` apart, so hops with
    ``(t-1)*L >= window`` are below every row's window on every device and
    the ring can stop rotating early — a Mistral-style window of 4K over a
    128K-token ring runs 2 hops instead of 32.
    """
    if not window:
        return n_shards
    return min(n_shards, (window - 1) // shard_len + 2)


def _hop_cfg(base, causal: bool, window: int, t: int, shard_len: int):
    """Kernel config for ring hop t (t >= 1; hop 0 is the diagonal).

    Without a window the rotated shard is entirely in the past, so the
    plain non-causal kernel is correct (and cheapest). With a window the
    hop re-creates its global alignment via ``q_offset = t * shard_len``:
    the kernel's mask sees q_pos - k_pos == the true global distance, so
    both the causal and the window edge land on the right columns.
    """
    if not (causal and window):
        return base
    return dataclasses.replace(
        base, causal=True, q_offset=t * shard_len, window=window,
        optimized_softmax=False)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _ring_attention(q, k, v, sinks, cfg, mesh, axis, causal, interpret):
    out, _ = _ring_fwd_impl(q, k, v, sinks, cfg, mesh, axis, causal,
                            interpret)
    return out


def _ring_fwd_impl(q, k, v, sinks, cfg, mesh, axis, causal, interpret):
    n_shards = mesh.shape[axis]
    shard_len = q.shape[2] // n_shards
    base = dataclasses.replace(cfg, causal=False, window=0, q_offset=0,
                               kv_loop=KVLoop.GRID, decompose=False)
    diag = dataclasses.replace(
        base, causal=causal, window=cfg.window,
        optimized_softmax=base.optimized_softmax and not cfg.window)
    spec = P(None, None, axis, None)
    lse_spec = P(None, None, axis)
    perm = [(j, (j + 1) % n_shards) for j in range(n_shards)]
    hops = _max_hop(cfg.window if causal else 0, shard_len, n_shards)

    def _ring_body(q, k, v, sinks=None):
        idx = jax.lax.axis_index(axis)
        # Step 0: own shard (the causal diagonal block when causal).
        o, lse = flash_forward_with_lse(q, k, v, diag, interpret=interpret)
        o = o.astype(jnp.float32)
        kk, vv = k, v
        for t in range(1, hops):
            kk = jax.lax.ppermute(kk, axis, perm)
            vv = jax.lax.ppermute(vv, axis, perm)
            o_t, lse_t = flash_forward_with_lse(
                q, kk, vv, _hop_cfg(base, causal, cfg.window, t, shard_len),
                interpret=interpret)
            if causal:
                # Shard now held originated at idx - t (mod P): strictly in
                # the past iff idx >= t; otherwise mask it out of the merge.
                lse_t = jnp.where(idx >= t, lse_t, _NEG)
            o, lse = _merge(o, lse, o_t.astype(jnp.float32), lse_t)
        if sinks is not None:
            # The sink joins the softmax denominator exactly once, against
            # the MERGED (global) LSE — same algebra as the single-chip
            # decomposed dispatch's post-band fold.
            z = sinks.astype(jnp.float32)[None, :, None]
            lse_tot = jnp.logaddexp(lse, z)
            o = o * jnp.exp(lse - lse_tot)[..., None]
            lse = lse_tot
        return o.astype(q.dtype), lse

    if sinks is None:
        ring = partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=(spec, lse_spec), check_rep=False)(
            lambda q, k, v: _ring_body(q, k, v))
        return ring(q, k, v)
    ring = partial(shard_map, mesh=mesh,
                   in_specs=(spec, spec, spec, P(None)),
                   out_specs=(spec, lse_spec), check_rep=False)(_ring_body)
    return ring(q, k, v, sinks)


def _ring_attention_fwd(q, k, v, sinks, cfg, mesh, axis, causal, interpret):
    out, lse = _ring_fwd_impl(q, k, v, sinks, cfg, mesh, axis, causal,
                              interpret)
    return out, (q, k, v, sinks, out, lse)


def _ring_attention_bwd(cfg, mesh, axis, causal, interpret, res, g):
    """Ring backward: the *global* LSE makes per-pair gradients exact.

    With P_ij = exp(S_ij - lse_i) already the true softmax weights, each
    (q shard i, kv shard j) pair's dq/dk/dv from the single-chip backward
    kernels are the exact partial contributions — no merge algebra. dq
    accumulates in place; dk/dv accumulate on buffers that travel the ring
    *with* their K/V shard, then take one final hop home.

    With sinks the saved LSE is sink-inclusive, so the recomputed P rows
    sum to ``1 - sink_weight`` exactly as in the forward and the kernel
    gradients stay exact (ops/autodiff.py's argument). The sink's own
    gradient is the per-row ``-exp(z - lse) * D`` summed over this
    device's rows and psummed over the ring.
    """
    q, k, v, sinks, out, lse = res
    n_shards = mesh.shape[axis]
    shard_len = q.shape[2] // n_shards
    base = dataclasses.replace(cfg, causal=False, window=0, q_offset=0,
                               kv_loop=KVLoop.GRID, decompose=False)
    diag = dataclasses.replace(
        base, causal=causal, window=cfg.window,
        optimized_softmax=base.optimized_softmax and not cfg.window)
    spec = P(None, None, axis, None)
    lse_spec = P(None, None, axis)
    perm = [(j, (j + 1) % n_shards) for j in range(n_shards)]
    hops = _max_hop(cfg.window if causal else 0, shard_len, n_shards)
    # After hops-1 rotations the traveling dK/dV buffers sit with a shard
    # that originated hops-1 devices back; one jump permutation sends every
    # buffer home (the original code's "one more hop" generalized to rings
    # cut short by a window).
    home = [(s, (s - (hops - 1)) % n_shards) for s in range(n_shards)]

    has_sinks = sinks is not None

    def _bwd_body(q, k, v, out, lse, do, sinks=None):
        idx = jax.lax.axis_index(axis)
        dq = jnp.zeros(q.shape, jnp.float32)
        kk, vv = k, v
        dkk = jnp.zeros(k.shape, jnp.float32)
        dvv = jnp.zeros(v.shape, jnp.float32)
        for t in range(hops):
            if t > 0:
                kk, vv, dkk, dvv = (jax.lax.ppermute(x, axis, perm)
                                    for x in (kk, vv, dkk, dvv))
            pair_cfg = diag if t == 0 else _hop_cfg(
                base, causal, cfg.window, t, shard_len)
            dq_t, dk_t, dv_t = flash_backward(q, kk, vv, out, lse, do,
                                              pair_cfg, interpret=interpret)
            if causal and t > 0:
                # Shard originated at idx - t: in the future unless idx >= t.
                valid = (idx >= t).astype(jnp.float32)
                dq_t = dq_t.astype(jnp.float32) * valid
                dk_t = dk_t.astype(jnp.float32) * valid
                dv_t = dv_t.astype(jnp.float32) * valid
            dq = dq + dq_t.astype(jnp.float32)
            dkk = dkk + dk_t.astype(jnp.float32)
            dvv = dvv + dv_t.astype(jnp.float32)
        if hops > 1:
            dkk = jax.lax.ppermute(dkk, axis, home)
            dvv = jax.lax.ppermute(dvv, axis, home)
        grads = (dq.astype(q.dtype), dkk.astype(k.dtype),
                 dvv.astype(v.dtype))
        if sinks is None:
            return grads
        # d(sink): -exp(z - lse) * D per local row, summed here, psummed
        # over the ring so every device returns the replicated total.
        d_row = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                        axis=-1)
        w = jnp.exp(sinks.astype(jnp.float32)[None, :, None] - lse)
        dsinks = jax.lax.psum(-jnp.sum(w * d_row, axis=(0, 2)), axis)
        return grads + (dsinks.astype(sinks.dtype),)

    if not has_sinks:
        ring_bwd = partial(
            shard_map, mesh=mesh,
            in_specs=(spec, spec, spec, spec, lse_spec, spec),
            out_specs=(spec, spec, spec), check_rep=False)(
            lambda q, k, v, out, lse, do: _bwd_body(q, k, v, out, lse, do))
        return (*ring_bwd(q, k, v, out, lse, g), None)
    ring_bwd = partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, spec, spec, lse_spec, spec, P(None)),
        out_specs=(spec, spec, spec, P(None)), check_rep=False)(_bwd_body)
    return ring_bwd(q, k, v, out, lse, g, sinks)


_ring_attention.defvjp(_ring_attention_fwd, _ring_attention_bwd)
