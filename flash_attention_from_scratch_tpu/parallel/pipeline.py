"""Pipeline parallelism: GPipe-style microbatched stages over a "pp" axis.

New TPU-first subsystem (the reference is single-GPU — SURVEY.md §5.7/5.8):
the Llama layer stack is split into ``n_stages`` contiguous stages, each
stage's parameters stacked on a leading axis sharded ``P("pp")``, and the
forward pass runs as a ``shard_map`` bucket-brigade: every device applies
its stage to its current microbatch, then ``ppermute`` hands activations to
the next stage while the previous stage starts the next microbatch. The
steady state keeps all stages busy; the (n_stages - 1)-step fill/drain
bubble is the standard GPipe cost, amortized by ``n_micro``.

Autodiff flows through ``ppermute`` (its transpose is the reverse
permutation), so ``jax.grad`` of a pipelined loss is itself a pipelined
backward pass — 1F1B-style schedule tuning is a later optimization, the
sharding and communication pattern are the real thing.

Embedding, final norm, and the LM head run replicated outside the pipeline
(they are a small fraction of FLOPs); only the layer stack is staged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import (
    LlamaConfig, _attention, _mlp, rms_norm, rope_tables,
)

__all__ = ["PIPELINE_AXIS", "stack_pipeline_params", "shard_pipeline_params",
           "pipeline_forward", "pipeline_loss_fn"]

PIPELINE_AXIS = "pp"


def stack_pipeline_params(params: dict, n_stages: int) -> dict:
    """Restack the per-layer param list into per-stage stacked leaves.

    ``layers`` (list of L dicts) becomes ``stages``: one dict whose leaves
    are (n_stages, L // n_stages, ...) arrays — the leading axis is what
    ``P("pp")`` shards, the second is the stage's local depth. Non-layer
    params pass through unchanged.
    """
    layers = params["layers"]
    n_layers = len(layers)
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers do not split into {n_stages} stages")
    per = n_layers // n_stages
    stacked = {
        key: jnp.stack([
            jnp.stack([layers[s * per + i][key] for i in range(per)])
            for s in range(n_stages)
        ])
        for key in layers[0]
    }
    out = {k: v for k, v in params.items() if k != "layers"}
    out["stages"] = stacked
    return out


def shard_pipeline_params(params: dict, mesh: Mesh) -> dict:
    """Stage-stacked leaves over P("pp"); everything else replicated."""
    def place(path, x):
        names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        spec = P(PIPELINE_AXIS) if "stages" in names else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def _stage_apply(stage_params, x, cfg: LlamaConfig, cos, sin, interpret):
    """Apply one stage's local layers. Leaves are (local_depth, ...)."""
    depth = jax.tree_util.tree_leaves(stage_params)[0].shape[0]
    for i in range(depth):
        layer = jax.tree_util.tree_map(lambda w: w[i], stage_params)
        h = _attention(layer, rms_norm(x, layer["attn_norm"], cfg.norm_eps),
                       cfg, cos, sin, interpret=interpret)
        if cfg.post_norms:
            h = rms_norm(h, layer["attn_post_norm"], cfg.norm_eps)
        x = x + h
        h = _mlp(layer, rms_norm(x, layer["mlp_norm"], cfg.norm_eps), cfg)
        if cfg.post_norms:
            h = rms_norm(h, layer["mlp_post_norm"], cfg.norm_eps)
        x = x + h
    return x


def pipeline_forward(params: dict, tokens, cfg: LlamaConfig, mesh: Mesh,
                     n_micro: int, interpret=None):
    """tokens (batch, seq) -> logits (batch, seq, vocab) fp32.

    ``params`` must be stage-stacked (``stack_pipeline_params``) and the
    batch must split into ``n_micro`` microbatches. The wall-clock cost is
    (n_micro + n_stages - 1) stage steps — the GPipe schedule.
    """
    from .mesh import mesh_interpret

    interpret = mesh_interpret(mesh, interpret)
    n_stages = mesh.shape[PIPELINE_AXIS]
    batch, seq = tokens.shape
    if batch % n_micro:
        raise ValueError(f"batch {batch} does not split into {n_micro} microbatches")
    mb = batch // n_micro

    x = params["embed"][tokens]  # replicated embed
    cos, sin = rope_tables(seq, cfg.d_head, cfg.rope_theta)
    stream = x.reshape(n_micro, mb, seq, cfg.dim)

    staged = _staged_fn(cfg, mesh, n_micro, n_stages, interpret)
    out = staged(params["stages"], stream, cos, sin).reshape(batch, seq, cfg.dim)
    out = rms_norm(out, params["final_norm"], cfg.norm_eps)
    return (out @ params["lm_head"]).astype(jnp.float32)


@functools.lru_cache(maxsize=64)
def _staged_fn(cfg: LlamaConfig, mesh: Mesh, n_micro: int, n_stages: int,
               interpret):
    """Cached jitted pipeline body.

    Built once per (cfg, mesh, n_micro, n_stages, interpret): a fresh
    ``@jax.jit`` closure per ``pipeline_forward`` call would miss jax's
    jit cache (keyed on function identity) and retrace + recompile the
    whole n_steps-deep scan on every training step.
    """
    perm = [(i, i + 1) for i in range(n_stages - 1)]  # no wraparound
    n_steps = n_micro + n_stages - 1

    @jax.jit
    def staged(stages, stream, cos, sin):
        def local(stages, stream, cos, sin):
            # shard_map keeps the sharded stage axis as a size-1 leading
            # dim on every leaf; drop it so leaves are (local_depth, ...).
            stages = jax.tree_util.tree_map(lambda w: w[0], stages)
            stage = jax.lax.axis_index(PIPELINE_AXIS)
            is_first = stage == 0
            is_last = stage == n_stages - 1

            def body(carry, t):
                buf, outs = carry
                x_in = jnp.where(
                    is_first,
                    stream[jnp.clip(t, 0, n_micro - 1)],
                    buf,
                )
                y = _stage_apply(stages, x_in, cfg, cos, sin, interpret)
                out_idx = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
                write = jnp.logical_and(is_last, t >= n_stages - 1)
                prev = jax.lax.dynamic_index_in_dim(outs, out_idx, 0,
                                                    keepdims=False)
                outs = jax.lax.dynamic_update_index_in_dim(
                    outs, jnp.where(write, y, prev), out_idx, 0)
                buf = jax.lax.ppermute(y, PIPELINE_AXIS, perm)
                return (buf, outs), None

            init = (jnp.zeros_like(stream[0]), jnp.zeros_like(stream))
            (buf, outs), _ = jax.lax.scan(body, init, jnp.arange(n_steps))
            # Only the last stage wrote outs; psum broadcasts it to all.
            return jax.lax.psum(outs, PIPELINE_AXIS)

        return shard_map(
            local, mesh=mesh,
            in_specs=(P(PIPELINE_AXIS), P(), P(), P()),
            out_specs=P(),
            check_rep=False,
        )(stages, stream, cos, sin)

    return staged


def pipeline_loss_fn(params, tokens, cfg: LlamaConfig, mesh: Mesh,
                     n_micro: int, interpret=None):
    """Next-token cross-entropy through the pipeline (differentiable)."""
    logits = pipeline_forward(params, tokens[:, :-1], cfg, mesh, n_micro,
                              interpret=interpret)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return jnp.mean(nll)
