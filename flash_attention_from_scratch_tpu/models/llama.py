"""Llama-3-family transformer built on the flash-attention kernel.

Extension beyond the reference (which is a single attention kernel with no
model; see BASELINE north star): a functional, pjit-friendly Llama
implementation — RMSNorm, RoPE, GQA attention through
``ops.flash_forward``, SwiGLU MLP — used as the flagship integration target
for quantized decode and multi-chip sharding. Pure pytree params (no flax
module state) so sharding is a pytree of PartitionSpecs.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..ops.autodiff import flash_attention
from ..ops.configs import DType, KernelConfig
from ..ops.quant_matmul import (
    QuantizedWeight, quant_matmul, quantize_weight,
    spmd_safe as _spmd_safe_quant,
)

__all__ = ["LlamaConfig", "init_params", "forward", "loss_fn", "LLAMA3_8B",
           "LLAMA31_8B", "MISTRAL_7B",
           "quantize_params", "init_quantized_params", "fuse_projections",
           "rope_inv_freq"]


def _mm(x, w):
    """Dense or quantized matmul, dispatched by weight type.

    A :class:`QuantizedWeight` carries its matmul recipe: ``act="int8"``
    selects the int8 x int8 MXU path (W8A8/W4A8), otherwise weight-only.
    """
    if isinstance(w, QuantizedWeight):
        return quant_matmul(x, w, act_quant=w.act == "int8")
    return x @ w


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    dim: int = 512
    n_layers: int = 2
    n_heads: int = 4
    n_kv_heads: int = 2
    d_head: int = 128
    hidden_dim: int = 1408
    rope_theta: float = 500000.0
    norm_eps: float = 1e-5
    dtype: DType = DType.BF16
    # Attention kernel config; block sizes are clamped to the sequence at
    # call time so tiny dry-run shapes work. Large KV blocks amortize the
    # online-softmax bookkeeping (profiles/autotune_r2.csv).
    block_q: int = 512
    block_kv: int = 2048
    # Sliding-window attention (Mistral-style): each position attends only
    # the previous `sliding_window` tokens. 0 = full causal attention.
    # Trains too: the backward kernels thread the same window/softcap masks
    # as the forward (ops/flash_backward.py).
    sliding_window: int = 0
    # Per-layer window cycle (Gemma-2 / GPT-OSS style): layer i uses
    # window_pattern[i % len] (0 = global). Overrides sliding_window when
    # non-empty, e.g. (4096, 0) alternates local/global layers.
    window_pattern: tuple = ()
    # --- Gemma-2-family knobs (defaults = plain Llama) ---
    # "gelu" switches the SwiGLU gate activation to tanh-approx GeLU (GeGLU).
    mlp_act: str = "silu"
    # Sandwich norms: extra RMSNorms on the attention and MLP OUTPUTS
    # (before the residual adds) — params carry attn_post_norm/mlp_post_norm.
    post_norms: bool = False
    # Scale the embedding output by sqrt(dim).
    embed_scale: bool = False
    # Logit softcaps: attention scores (kernel-fused) and final lm logits.
    attn_softcap: float = 0.0
    final_softcap: float = 0.0
    # Attention scale override (Gemma-2 query_pre_attn_scalar**-0.5);
    # 0 = the standard 1/sqrt(d_head).
    attn_scale: float = 0.0
    # GPT-OSS-style attention sinks: one learned logit per Q head per layer
    # joins the softmax denominator (no value). Trains end-to-end: the
    # forward LSE includes the sink term and d(sink) falls out of the FA2
    # backward (ops/autodiff.py).
    attn_sinks: bool = False
    # Llama-3.1-style RoPE frequency scaling for long context: wavelengths
    # beyond `rope_orig_ctx / rope_high_factor` are stretched, up to
    # `rope_scale_factor` x for wavelengths beyond `rope_orig_ctx /
    # rope_low_factor`, with a linear ramp between. 0 = no scaling.
    rope_scale_factor: float = 0.0
    rope_low_factor: float = 1.0
    rope_high_factor: float = 4.0
    rope_orig_ctx: int = 8192

    def layer_window(self, li: int) -> int:
        """Effective sliding window of layer ``li`` (0 = full causal)."""
        if self.window_pattern:
            return self.window_pattern[li % len(self.window_pattern)]
        return self.sliding_window

    def attn_config(self, seq_len: int, layer: int | None = None, *,
                    training: bool = True) -> KernelConfig:
        """Measured-best causal kernel config for this model at ``seq_len``.

        Data: profiles/causal_llama_r4.csv (Llama 32/8-GQA shapes, causal
        FLOP accounting, chain timer). Round 4's winner for PLAIN causal is
        the row-band decomposition (``decompose``): every Q band runs one
        whole-KV single-shot call over its visible prefix, so nearly all
        work lands at the chip's best rate — 125/160/174 TFLOP/s at
        2048/4096/8192 vs the best monolithic walk's 87.6/103.2/122.8.
        Trains too (band LSEs are the full problem's; the standard FA2
        backward consumes them). Round 5 extends banding to sliding
        windows: a window only clips each band's KV slice from below, so
        windowed layers >= 4K route through the same decomposition
        (profiles/window_v5e.csv); short windowed shapes keep the round-3
        monolithic policy. Mask elision measured strictly worse and
        stays off; the TRI pair-grid measured worse too and was removed
        in round 5 (see profiles/causal_llama_r4.csv).
        """

        def largest_divisor_block(limit: int, quantum: int) -> int:
            b = min(limit, seq_len)
            b -= b % quantum
            while b >= quantum and seq_len % b != 0:
                b -= quantum
            if b < quantum:
                raise ValueError(
                    f"seq_len {seq_len} is not a multiple of {quantum}; pad the "
                    f"sequence before calling the model"
                )
            return b

        window = (self.layer_window(layer) if layer is not None
                  else self.sliding_window)
        common = dict(d_head=self.d_head, dtype=self.dtype, causal=True,
                      window=window, attn_softcap=self.attn_softcap,
                      # The first-KV-block softmax specialization assumes KV
                      # block 0 is visible, which a window breaks.
                      optimized_softmax=not window)
        bq = largest_divisor_block(self.block_q, 8)
        group = self.n_heads // self.n_kv_heads
        hp = next((c for c in (4, 2)
                   if self.n_heads % c == 0 and group % c == 0), 1)
        if (seq_len % 512 == 0
                and seq_len >= (4096 if window else 2048)):
            # Row-band decomposition: dispatch-level banding; the config's
            # block/overlap knobs parameterize each band's single-shot
            # call. Softcap is elementwise per band; a window clips each
            # band's KV slice (round-5 extension) so windowed layers band
            # from 4K up — below that the whole-KV monolithic call already
            # covers the window.
            return KernelConfig(block_q=bq, block_kv=2048, decompose=True,
                                kv_splits=2, q_splits=2, head_pack=hp,
                                **common)
        if seq_len >= 4096 and seq_len % 1024 == 0:
            from ..ops.configs import KVLoop

            # Windowed long-context: packed FORI early-exit walk (one
            # shared KV DMA stream per packed group); 3 buffers beat 2.
            return KernelConfig(block_q=bq, block_kv=1024,
                                kv_loop=KVLoop.FORI, head_pack=hp,
                                num_kv_buffers=3, **common)
        # Whole-seq KV single-shot softmax pays up to 4096 even causal
        # (79.0 vs 67.6 at seq 4096); past that the per-program predicated
        # DMA waste outgrows it and block_kv caps at the configured limit.
        bkv_limit = seq_len if seq_len <= 4096 else self.block_kv
        bkv = largest_divisor_block(bkv_limit, 128)
        kw = {}
        if seq_len <= 4096:
            # sp2+qs2 overlap the exp pass with the next sub-tile's matmul
            # (+24% at seq 2048); at 8192 the same knobs measure *slower*
            # under causal predication, so they stay off there.
            if bkv >= 2048 and bkv % 256 == 0:
                kw["kv_splits"] = 2
            if bq % (2 * self.dtype.min_tile[0]) == 0:
                kw["q_splits"] = 2
            # GQA group packing: packed Q heads share their group's KV tile
            # (one KV stream per group instead of per Q head) and their
            # independent chains overlap. +7% on top of sp2+qs2 at Llama
            # 32/8-head shapes (86.5 vs 81.0 at seq 2048, 83.5 vs 79.0 at
            # 4096; profiles/causal_llama_v5e.csv).
            group = self.n_heads // self.n_kv_heads
            hp = next((c for c in (4, 2)
                       if self.n_heads % c == 0
                       and (group % c == 0 or c % group == 0)), 1)
            if hp > 1:
                kw["head_pack"] = hp
        return KernelConfig(block_q=bq, block_kv=bkv, **common, **kw)


LLAMA3_8B = LlamaConfig(
    vocab_size=128256, dim=4096, n_layers=32, n_heads=32, n_kv_heads=8,
    d_head=128, hidden_dim=14336,
)

# Llama 3.1: same architecture + the published long-context RoPE scaling.
LLAMA31_8B = dataclasses.replace(
    LLAMA3_8B, rope_scale_factor=8.0, rope_low_factor=1.0,
    rope_high_factor=4.0, rope_orig_ctx=8192)

# Mistral-7B v0.1 shapes: 4096-token sliding window on every layer.
MISTRAL_7B = LlamaConfig(
    vocab_size=32000, dim=4096, n_layers=32, n_heads=32, n_kv_heads=8,
    d_head=128, hidden_dim=14336, rope_theta=10000.0, sliding_window=4096)


def _dense_init(key, shape, dtype):
    fan_in = shape[0]
    return (jax.random.normal(key, shape, jnp.float32) / math.sqrt(fan_in)).astype(dtype)


def init_params(cfg: LlamaConfig, key) -> dict:
    dt = cfg.dtype.jnp_dtype
    keys = jax.random.split(key, cfg.n_layers + 2)
    params = {
        "embed": _dense_init(keys[0], (cfg.vocab_size, cfg.dim), dt),
        "final_norm": jnp.ones((cfg.dim,), dt),
        "lm_head": _dense_init(keys[1], (cfg.dim, cfg.vocab_size), dt),
        "layers": [],
    }
    q_dim = cfg.n_heads * cfg.d_head
    kv_dim = cfg.n_kv_heads * cfg.d_head
    for i in range(cfg.n_layers):
        k = jax.random.split(keys[i + 2], 7)
        layer = {
            "attn_norm": jnp.ones((cfg.dim,), dt),
            "wq": _dense_init(k[0], (cfg.dim, q_dim), dt),
            "wk": _dense_init(k[1], (cfg.dim, kv_dim), dt),
            "wv": _dense_init(k[2], (cfg.dim, kv_dim), dt),
            "wo": _dense_init(k[3], (q_dim, cfg.dim), dt),
            "mlp_norm": jnp.ones((cfg.dim,), dt),
            "w_gate": _dense_init(k[4], (cfg.dim, cfg.hidden_dim), dt),
            "w_up": _dense_init(k[5], (cfg.dim, cfg.hidden_dim), dt),
            "w_down": _dense_init(k[6], (cfg.hidden_dim, cfg.dim), dt),
        }
        if cfg.post_norms:
            layer["attn_post_norm"] = jnp.ones((cfg.dim,), dt)
            layer["mlp_post_norm"] = jnp.ones((cfg.dim,), dt)
        if cfg.attn_sinks:
            # fp32 like the kernel expects; zero-init = sink weight equal to
            # an average pre-softmax logit (GPT-OSS initializes near zero).
            layer["attn_sinks"] = jnp.zeros((cfg.n_heads,), jnp.float32)
        params["layers"].append(layer)
    return params


_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_params(params, mode: str = "int8", quantize_lm_head: bool = True,
                    act: str = "bf16"):
    """Weight-only quantization of every dense projection (norms/embed stay).

    Returns a params pytree where 2-D projection weights are
    :class:`QuantizedWeight`; the model dispatches through ``_mm``.
    """
    out = dict(params)
    if quantize_lm_head:
        out["lm_head"] = quantize_weight(params["lm_head"], mode, act)
    out["layers"] = [
        {k: (quantize_weight(v, mode, act) if k in _QUANT_KEYS else v)
         for k, v in layer.items()}
        for layer in params["layers"]
    ]
    return out


def init_quantized_params(cfg: LlamaConfig, key, mode: str = "int8",
                          quantize_lm_head: bool = True,
                          act: str = "bf16") -> dict:
    """Random already-quantized params — for memory-bound benchmarks.

    ``init_params`` + ``quantize_params`` needs the dense model in HBM first
    (16 GB for Llama-3-8B — more than a v5e chip); this builds int8/int4
    weights directly so an 8B decode benchmark fits a single chip.
    """
    dt = cfg.dtype.jnp_dtype
    keys = jax.random.split(key, cfg.n_layers + 2)
    kpack = 2 if mode == "int4" else 1
    qmax = 7.0 if mode == "int4" else 127.0  # must match quant_matmul's dequant

    def qw(key, shape):
        fan_in = shape[0]
        vals = jax.random.randint(key, (shape[0] // kpack, shape[1]), -127, 128,
                                  jnp.int8)
        scale = jnp.full((shape[1],), 1.0 / (qmax * math.sqrt(fan_in)),
                         jnp.float32)
        return QuantizedWeight(vals, scale, mode, dt, act)

    q_dim = cfg.n_heads * cfg.d_head
    kv_dim = cfg.n_kv_heads * cfg.d_head
    params = {
        "embed": _dense_init(keys[0], (cfg.vocab_size, cfg.dim), dt),
        "final_norm": jnp.ones((cfg.dim,), dt),
        "lm_head": (qw(keys[1], (cfg.dim, cfg.vocab_size)) if quantize_lm_head
                    else _dense_init(keys[1], (cfg.dim, cfg.vocab_size), dt)),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        k = jax.random.split(keys[i + 2], 7)
        params["layers"].append({
            "attn_norm": jnp.ones((cfg.dim,), dt),
            "wq": qw(k[0], (cfg.dim, q_dim)),
            "wk": qw(k[1], (cfg.dim, kv_dim)),
            "wv": qw(k[2], (cfg.dim, kv_dim)),
            "wo": qw(k[3], (q_dim, cfg.dim)),
            "mlp_norm": jnp.ones((cfg.dim,), dt),
            "w_gate": qw(k[4], (cfg.dim, cfg.hidden_dim)),
            "w_up": qw(k[5], (cfg.dim, cfg.hidden_dim)),
            "w_down": qw(k[6], (cfg.hidden_dim, cfg.dim)),
        })
    return params


def fuse_projections(params) -> dict:
    """Fuse each layer's QKV and gate|up into single weight streams.

    7 weight matmuls per layer become 4 (wqkv, wo, w_gate_up, w_down):
    fewer, larger kernels keep the decode-time HBM weight stream saturated
    (the per-kernel ramp is amortized over 2-3.5x the bytes). Exact for
    both dense weights (plain concat) and quantized ones (per-output-
    channel scales concat). The model functions use the fused entries when
    present; unfused params keep working.
    """
    from ..ops.quant_matmul import concat_weights

    def cat(ws):
        if isinstance(ws[0], QuantizedWeight):
            return concat_weights(ws)
        return jnp.concatenate(ws, axis=1)

    if any("bq" in layer for layer in params["layers"]):
        raise NotImplementedError(
            "fuse_projections with QKV biases (Qwen2-style) would need a "
            "fused bias path through _qkv; keep projections unfused")
    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        fused = {k: v for k, v in layer.items()
                 if k not in ("wq", "wk", "wv", "w_gate", "w_up")}
        fused["wqkv"] = cat([layer["wq"], layer["wk"], layer["wv"]])
        fused["w_gate_up"] = cat([layer["w_gate"], layer["w_up"]])
        out["layers"].append(fused)
    return out


def _qkv(layer, x, cfg: LlamaConfig):
    """Project x -> (q, k, v) rows, through the fused weight if present.

    Optional per-projection biases (``bq``/``bk``/``bv`` — Qwen2-style
    checkpoints) add after the matmul; Llama checkpoints carry none.
    """
    q_dim = cfg.n_heads * cfg.d_head
    kv_dim = cfg.n_kv_heads * cfg.d_head
    if "wqkv" in layer:
        qkv = _mm(x, layer["wqkv"])
        return (qkv[..., :q_dim], qkv[..., q_dim:q_dim + kv_dim],
                qkv[..., q_dim + kv_dim:])
    q = _mm(x, layer["wq"])
    k = _mm(x, layer["wk"])
    v = _mm(x, layer["wv"])
    if "bq" in layer:
        q = q + layer["bq"]
        k = k + layer["bk"]
        v = v + layer["bv"]
    return q, k, v


def _q_scale_ratio(cfg: LlamaConfig) -> float:
    """Pre-multiply factor turning the kernel's 1/sqrt(d_head) into
    cfg.attn_scale (Gemma-2 query_pre_attn_scalar). 1.0 when unset."""
    return (cfg.attn_scale * math.sqrt(cfg.d_head)) if cfg.attn_scale else 1.0


def _o_proj(layer, out):
    """Output projection, plus its bias when the checkpoint carries one."""
    y = _mm(out, layer["wo"])
    return y + layer["bo"] if "bo" in layer else y


def rms_norm(x, weight, eps):
    x32 = x.astype(jnp.float32)
    norm = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (norm * weight.astype(jnp.float32)).astype(x.dtype)


def rope_inv_freq(cfg: LlamaConfig):
    """Per-channel inverse frequencies, with optional Llama-3.1 scaling.

    The scaling (rope_scale_factor > 0) stretches long wavelengths so a
    model trained at rope_orig_ctx generalizes past it: wavelengths shorter
    than orig/high_factor keep their frequency, longer than orig/low_factor
    divide by scale_factor, and the band between interpolates smoothly —
    the published Llama-3.1 recipe.
    """
    d_head, theta = cfg.d_head, cfg.rope_theta
    inv_freq = 1.0 / (theta ** (jnp.arange(0, d_head, 2, dtype=jnp.float32)
                                / d_head))
    if not cfg.rope_scale_factor:
        return inv_freq
    wavelen = 2.0 * math.pi / inv_freq
    low_len = cfg.rope_orig_ctx / cfg.rope_low_factor
    high_len = cfg.rope_orig_ctx / cfg.rope_high_factor
    # smooth in [0, 1]: 1 at high-frequency end (keep), 0 at low (full scale)
    smooth = (cfg.rope_orig_ctx / wavelen - cfg.rope_low_factor) / (
        cfg.rope_high_factor - cfg.rope_low_factor)
    smooth = jnp.clip(smooth, 0.0, 1.0)
    scaled = inv_freq / cfg.rope_scale_factor
    blended = (1.0 - smooth) * scaled + smooth * inv_freq
    return jnp.where(wavelen < high_len, inv_freq,
                     jnp.where(wavelen > low_len, scaled, blended))


def rope_tables(seq_len: int, d_head: int, theta: float, cfg=None):
    """Rotary embedding cos/sin tables, fp32, shape (seq, d_head//2).

    Pass ``cfg`` to honor its RoPE scaling; the bare (d_head, theta) form
    keeps the unscaled behavior.
    """
    if cfg is not None:
        inv_freq = rope_inv_freq(cfg)
    else:
        inv_freq = 1.0 / (theta ** (jnp.arange(0, d_head, 2,
                                               dtype=jnp.float32) / d_head))
    pos = jnp.arange(seq_len, dtype=jnp.float32)
    angles = pos[:, None] * inv_freq[None, :]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x, cos, sin):
    """x: (batch, heads, seq, d_head); rotate-half convention."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out1 = xf1 * cos - xf2 * sin
    out2 = xf2 * cos + xf1 * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)


def _attention(layer, x, cfg: LlamaConfig, cos, sin, interpret=None, mesh=None,
               li: int = 0):
    b, s, _ = x.shape
    q, k, v = _qkv(layer, x, cfg)
    q = q.reshape(b, s, cfg.n_heads, cfg.d_head).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, cfg.n_kv_heads, cfg.d_head).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, cfg.n_kv_heads, cfg.d_head).transpose(0, 2, 1, 3)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if cfg.attn_scale:
        q = (q.astype(jnp.float32) * _q_scale_ratio(cfg)).astype(q.dtype)
    # GQA is native to the kernel: Q head h reads KV head h // group via the
    # BlockSpec index map, so K/V are never materialized at n_heads width.
    if mesh is not None and "sp" in mesh.axis_names:
        # Context parallelism: sequence shards stay resident, K/V rotate
        # around the ICI ring. Everything else in the layer is pointwise
        # over seq, so only attention needs the ring. Sinks (replicated
        # over sp) fold into the ring's merged LSE once, post-ring.
        from ..parallel.ring_attention import ring_flash_attention

        out = ring_flash_attention(
            q, k, v, cfg.attn_config(s // mesh.shape["sp"], layer=li), mesh,
            axis="sp", interpret=interpret,
            sinks=layer.get("attn_sinks"))
    elif mesh is not None:
        # Heads are the sharded axis; sinks are per-head, so each shard
        # gets its local head-slice of the sink vector (round 5 — lifts
        # the r4 NotImplementedError).
        from ..parallel.sharded_attention import shard_mapped_attention

        out = shard_mapped_attention(q, k, v, cfg.attn_config(s, layer=li),
                                     mesh, interpret,
                                     sinks=layer.get("attn_sinks"))
    else:
        out = flash_attention(q, k, v, cfg.attn_config(s, layer=li), interpret,
                              layer.get("attn_sinks"))
    out = out.transpose(0, 2, 1, 3).reshape(b, s, cfg.n_heads * cfg.d_head)
    return _o_proj(layer, out)


def _mlp(layer, x, cfg=None):
    if "w_gate_up" in layer:
        gu = _mm(x, layer["w_gate_up"])
        h = gu.shape[-1] // 2
        g, up = gu[..., :h], gu[..., h:]
    else:
        g, up = _mm(x, layer["w_gate"]), _mm(x, layer["w_up"])
    act = (jax.nn.gelu if cfg is not None and cfg.mlp_act == "gelu"
           else jax.nn.silu)  # jax.nn.gelu default = tanh approx (HF's
    # gelu_pytorch_tanh)
    gate = act(g.astype(jnp.float32)).astype(x.dtype)
    return _mm(gate * up, layer["w_down"])


@_spmd_safe_quant
def forward(params, tokens, cfg: LlamaConfig, interpret=None, mesh=None,
            remat: bool = False):
    """tokens (batch, seq) int32 -> logits (batch, seq, vocab) fp32.

    ``remat=True`` checkpoints each transformer layer: the backward pass
    rematerializes layer activations instead of keeping every layer's
    attention/MLP intermediates alive — peak temp memory drops from
    O(layers * seq * hidden) to O(seq * hidden) at the cost of one extra
    forward (the standard FLOPs-for-HBM trade on TPU).
    """
    pin = lambda x: x  # noqa: E731
    if mesh is not None:
        from ..parallel.mesh import MODEL_AXIS, pin_residual

        if MODEL_AXIS in mesh.axis_names:
            # Residual stays model-axis-replicated: one all-reduce after each
            # row-parallel matmul instead of per-consumer all-gathers (see
            # parallel.mesh.pin_residual). dp/sp placements pass through.
            import functools as _ft

            pin = _ft.partial(pin_residual, mesh=mesh, seq_dim=1)
    x = params["embed"][tokens]
    if cfg.embed_scale:
        x = (x.astype(jnp.float32) * math.sqrt(cfg.dim)).astype(x.dtype)
    x = pin(x)
    cos, sin = rope_tables(tokens.shape[1], cfg.d_head, cfg.rope_theta,
                           cfg=cfg)

    def layer_fn(x, layer, li):
        h = _attention(layer, rms_norm(x, layer["attn_norm"], cfg.norm_eps),
                       cfg, cos, sin, interpret=interpret, mesh=mesh, li=li)
        if cfg.post_norms:
            h = rms_norm(h, layer["attn_post_norm"], cfg.norm_eps)
        x = pin(x + h)
        h = _mlp(layer, rms_norm(x, layer["mlp_norm"], cfg.norm_eps), cfg)
        if cfg.post_norms:
            h = rms_norm(h, layer["mlp_post_norm"], cfg.norm_eps)
        return pin(x + h)

    if remat:
        layer_fn = jax.checkpoint(layer_fn, static_argnums=(2,))
    for li, layer in enumerate(params["layers"]):
        x = layer_fn(x, layer, li)
    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    logits = _mm(x, params["lm_head"]).astype(jnp.float32)
    if cfg.final_softcap:
        logits = jnp.tanh(logits / cfg.final_softcap) * cfg.final_softcap
    return logits


def loss_fn(params, tokens, cfg: LlamaConfig, interpret=None, mesh=None,
            remat: bool = False):
    """Next-token cross-entropy (mean over all positions)."""
    logits = forward(params, tokens[:, :-1], cfg, interpret=interpret,
                     mesh=mesh, remat=remat)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return jnp.mean(nll)
