"""Pure-jnp reference attention: the numerics oracle.

Analogue of the reference's einops oracle ``py_flash_attention``
(``py/flash_helpers/test/utils.py:137-162``), computed twice — once in the
native 16-bit dtype and once upcast to fp32 — to drive the adaptive tolerance
rule (``test/test.py:57-61``). Also provides a block-recurrence mirror of the
Pallas kernel for step-by-step debugging (analogue of
``tools/debug/debug.py:40-153``).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "reference_attention",
    "reference_pair",
    "block_flash_attention",
]


@partial(jax.jit, static_argnames=("causal", "scale_override", "q_offset",
                                   "window", "softcap"))
def reference_attention(q, k, v, *, causal: bool = False, scale_override=None,
                        q_offset: int | None = None, window: int = 0,
                        softcap: float = 0.0, sinks=None):
    """Straightforward softmax(QK^T * scale) V in the input dtype.

    Shapes: q, k, v are (batch, heads, seq, d_head). Matmuls run in the input
    dtype with fp32 accumulation (``preferred_element_type``), softmax in the
    upcast dtype — mirroring how the reference's 16-bit torch einsum behaves.

    ``sinks`` (optional, (heads,) fp32) are GPT-OSS/StreamingLLM-style
    attention sinks: one learned logit per head that participates in the
    softmax denominator but contributes no value — softmax is taken over
    ``[scale * QK^T, sink]`` and the sink column is dropped.
    """
    d = q.shape[-1]
    scale = scale_override if scale_override is not None else 1.0 / math.sqrt(d)
    if k.shape[1] != q.shape[1]:  # GQA: broadcast KV heads to Q heads
        group = q.shape[1] // k.shape[1]
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)
    # precision=HIGHEST so the fp32 oracle is a true fp32 oracle on TPU (the
    # default TPU matmul precision would silently round f32 operands to
    # bf16). Only for f32 inputs: 16-bit operands are already exact on the
    # MXU, and Mosaic rejects bf16 dots carrying fp32 contract precision
    # ("Bad lhs type") in some fusions (seen with the softcap tanh).
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k,
        preferred_element_type=jnp.float32, precision=prec,
    )
    s = s * scale
    if softcap:
        s = jnp.tanh(s / softcap) * softcap  # Gemma-2 logit softcap
    if causal:
        # q_offset None = bottom-right alignment (q row i sees kv up to
        # k_len - q_len + i, the flash-attn cross-causal convention);
        # an explicit offset means q row i sees kv [0, q_offset + i] —
        # the kernel's chunked-prefill semantics (configs.KernelConfig
        # q_offset, where the kernel's default 0 is top-left).
        q_len, k_len = s.shape[-2], s.shape[-1]
        diag = k_len - q_len if q_offset is None else q_offset
        mask = jnp.tril(jnp.ones((q_len, k_len), dtype=bool), k=diag)
        if window:
            # Sliding window: q position p sees kv (p - window, p].
            mask &= ~jnp.tril(jnp.ones((q_len, k_len), dtype=bool),
                              k=diag - window)
        # Finite mask value, not -inf: XLA may fuse this softmax into the PV
        # matmul with a *blockwise* max, and a fully-masked KV block then
        # yields exp(-inf - (-inf)) = NaN (observed with the softcap tanh in
        # the graph, rows whose masked span covers a whole block). Same
        # choice as the kernel's MASK_VALUE.
        s = jnp.where(mask, s, -1e30)
    if sinks is not None:
        # Append the per-head sink logit as a virtual column, softmax over
        # the augmented row, then drop the sink column: it shrinks every
        # real weight by its share of the denominator.
        z = jnp.broadcast_to(
            sinks.astype(jnp.float32).reshape(1, -1, 1, 1),
            (*s.shape[:-1], 1))
        p = jax.nn.softmax(jnp.concatenate([s, z], axis=-1), axis=-1)
        p = p[..., :-1].astype(q.dtype)
    else:
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p, v,
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(q.dtype)


def reference_pair(q, k, v, *, causal: bool = False, q_offset=None,
                   window: int = 0, softcap: float = 0.0, sinks=None):
    """(native-dtype output, fp32 output) for the adaptive tolerance rule.

    Port of the double-oracle setup in ``test/utils.py:137-162``: the fp32
    pass upcasts the same inputs, so ``|ref16 - ref32|`` measures pure
    rounding error of the dtype at this problem size.
    """
    out_native = reference_attention(q, k, v, causal=causal,
                                     q_offset=q_offset, window=window,
                                     softcap=softcap, sinks=sinks)
    out_fp32 = reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        causal=causal, q_offset=q_offset, window=window, softcap=softcap,
        sinks=sinks,
    )
    return out_native, out_fp32


def block_flash_attention(
    q,
    k,
    v,
    *,
    block_q: int = 128,
    block_kv: int = 128,
    use_exp2: bool = True,
    reverse_kv: bool = False,
    collect_trace: bool = False,
):
    """Block-by-block online-softmax recurrence in plain jnp (fp32 stats).

    Mirrors exactly what the Pallas kernel computes per (q_block, kv_block)
    iteration — the TPU analogue of the PyTorch step-by-step debugger
    (``tools/debug/debug.py:40-153``, which mirrored warp 2's view with
    reversed block order). With ``collect_trace=True`` returns every
    intermediate (S, m, l, P, O_partial) per iteration for diffing against
    ``pl.debug_print`` / interpret-mode dumps.

    Runs in plain Python loops (not jitted) — it is a debugging tool.
    """
    b, h, s_q, d = q.shape
    s_kv = k.shape[2]
    if s_q % block_q or s_kv % block_kv:
        raise ValueError(
            f"seq ({s_q}, {s_kv}) not divisible by blocks "
            f"({block_q}, {block_kv}) — the mirror would silently drop rows")
    scale = 1.0 / math.sqrt(d)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    n_q = s_q // block_q
    n_kv = s_kv // block_kv
    out = jnp.zeros((b, h, s_q, d), jnp.float32)
    trace = []

    kv_order = range(n_kv - 1, -1, -1) if reverse_kv else range(n_kv)
    for qi in range(n_q):
        q_blk = qf[:, :, qi * block_q : (qi + 1) * block_q]
        m = jnp.full((b, h, block_q, 1), -jnp.inf, jnp.float32)
        l = jnp.zeros((b, h, block_q, 1), jnp.float32)
        acc = jnp.zeros((b, h, block_q, d), jnp.float32)
        for ki in kv_order:
            k_blk = kf[:, :, ki * block_kv : (ki + 1) * block_kv]
            v_blk = vf[:, :, ki * block_kv : (ki + 1) * block_kv]
            s_blk = jnp.einsum(
                "bhqd,bhkd->bhqk", q_blk, k_blk,
                precision=jax.lax.Precision.HIGHEST,
            )
            if use_exp2:
                s_blk = s_blk * (scale * math.log2(math.e))
                m_new = jnp.maximum(m, s_blk.max(-1, keepdims=True))
                p = jnp.exp2(s_blk - m_new)
                alpha = jnp.exp2(m - m_new)
            else:
                s_blk = s_blk * scale
                m_new = jnp.maximum(m, s_blk.max(-1, keepdims=True))
                p = jnp.exp(s_blk - m_new)
                alpha = jnp.exp(m - m_new)
            l = l * alpha + p.sum(-1, keepdims=True)
            acc = acc * alpha + jnp.einsum(
                "bhqk,bhkd->bhqd", p, v_blk, precision=jax.lax.Precision.HIGHEST
            )
            m = m_new
            if collect_trace:
                trace.append(
                    dict(q_block=qi, kv_block=ki, S=s_blk, m=m, l=l, P=p, O=acc)
                )
        out = out.at[:, :, qi * block_q : (qi + 1) * block_q].set(acc / l)
    result = out.astype(q.dtype)
    if collect_trace:
        return result, trace
    return result
