"""Llama model tests: shapes, numerics vs naive attention, gradient flow."""

import jax
import jax.numpy as jnp
import pytest

from flash_attention_from_scratch_tpu.models.llama import (
    LlamaConfig, forward, init_params, loss_fn,
)

CFG = LlamaConfig(vocab_size=256, dim=256, n_layers=2, n_heads=2, n_kv_heads=1,
                  d_head=128, hidden_dim=512, block_q=128, block_kv=128)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def tokens():
    return jax.random.randint(jax.random.PRNGKey(1), (2, 128), 0, CFG.vocab_size)


def test_forward_shape_dtype(params, tokens):
    logits = forward(params, tokens, CFG)
    assert logits.shape == (2, 128, CFG.vocab_size)
    assert logits.dtype == jnp.float32


def test_forward_matches_reference_attention(params, tokens):
    """Swapping the kernel for the jnp oracle must not change the logits
    beyond bf16 noise — catches wiring bugs (RoPE, GQA repeat, causal)."""
    from flash_attention_from_scratch_tpu.models import llama as llama_mod
    from flash_attention_from_scratch_tpu.ops.reference import reference_attention

    logits_kernel = forward(params, tokens, CFG)

    orig = llama_mod.flash_attention
    llama_mod.flash_attention = (
        lambda q, k, v, cfg, interpret=None, sinks=None: reference_attention(
            q, k, v, causal=cfg.causal, sinks=sinks
        )
    )
    try:
        logits_ref = forward(params, tokens, CFG)
    finally:
        llama_mod.flash_attention = orig

    diff = jnp.max(jnp.abs(logits_kernel - logits_ref))
    assert diff < 0.1, f"kernel vs reference logits max diff {diff}"


def test_loss_and_grad(params):
    # 129 tokens -> model seq 128 after the next-token shift.
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 129), 0, CFG.vocab_size)
    loss, grads = jax.value_and_grad(lambda p: loss_fn(p, tokens, CFG))(params)
    assert jnp.isfinite(loss)
    g = grads["layers"][0]["wq"]
    assert jnp.isfinite(g).all()
    assert float(jnp.abs(g).max()) > 0.0  # gradient actually flows through attention


def test_fused_projections_match_unfused(params, tokens):
    """fuse_projections (QKV + gate|up concat) must not change the logits.

    Dense concat is exact up to XLA tiling differences of the same matmul;
    quantized concat is exact by construction (per-output-channel scales).
    """
    import numpy as np

    from flash_attention_from_scratch_tpu.models.llama import (
        fuse_projections, quantize_params,
    )

    fused = fuse_projections(params)
    assert "wqkv" in fused["layers"][0] and "wq" not in fused["layers"][0]
    ref = forward(params, tokens, CFG)
    out = forward(fused, tokens, CFG)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)

    qp = quantize_params(params, "int8")
    ref_q = forward(qp, tokens, CFG)
    out_q = forward(fuse_projections(qp), tokens, CFG)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(ref_q),
                               atol=5e-2, rtol=5e-2)


def test_fused_decode_step_matches_unfused(params):
    """The paged decode path through wqkv/w_gate_up == separate weights."""
    import numpy as np

    from flash_attention_from_scratch_tpu.models.decode import (
        decode_step, init_cache, prefill,
    )
    from flash_attention_from_scratch_tpu.models.llama import fuse_projections

    prompt = np.zeros((1, 128), np.int32)
    prompt[0, :32] = np.arange(32) % CFG.vocab_size
    table = jnp.asarray(np.arange(4, dtype=np.int32))

    outs = {}
    for name, p in (("unfused", params), ("fused", fuse_projections(params))):
        cache = init_cache(CFG, 8, 64)
        logits, cache = prefill(p, jnp.asarray(prompt), CFG, cache, table,
                                prompt_len=32)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)[None]
        lg, _ = decode_step(p, tok, CFG, cache,
                            jnp.asarray([33], jnp.int32), table[None])
        outs[name] = (np.asarray(logits), np.asarray(lg))
    np.testing.assert_allclose(outs["fused"][0], outs["unfused"][0],
                               atol=5e-2, rtol=5e-2)
    np.testing.assert_allclose(outs["fused"][1], outs["unfused"][1],
                               atol=5e-2, rtol=5e-2)


def test_fused_params_shard(params, cpu_mesh_devices):
    """Fused weights take column-parallel specs and place on a (dp,tp) mesh."""
    from flash_attention_from_scratch_tpu.models.llama import fuse_projections
    from flash_attention_from_scratch_tpu.parallel.mesh import (
        llama_param_specs, make_mesh, shard_params,
    )

    fused = fuse_projections(params)
    specs = llama_param_specs(fused)
    assert str(specs["layers"][0]["wqkv"]) == str(
        jax.sharding.PartitionSpec(None, "tp"))
    mesh = make_mesh(1, 2, devices=cpu_mesh_devices[:2])
    sharded = shard_params(fused, mesh)
    assert sharded["layers"][0]["wqkv"].sharding.spec[1] == "tp"


def test_rope_scaling_consistency():
    """Llama-3.1 RoPE scaling: decode matches the scaled forward pass, and
    scaling actually changes long-wavelength frequencies."""
    import numpy as np

    from flash_attention_from_scratch_tpu.models.decode import (
        decode_step, init_cache, prefill)
    from flash_attention_from_scratch_tpu.models.llama import (
        LlamaConfig, forward, init_params, rope_inv_freq)

    cfg = LlamaConfig(vocab_size=256, dim=256, n_layers=2, n_heads=2,
                      n_kv_heads=1, d_head=128, hidden_dim=256,
                      block_q=128, block_kv=128,
                      rope_scale_factor=8.0, rope_orig_ctx=64)
    base = LlamaConfig(**{**cfg.__dict__, "rope_scale_factor": 0.0})
    f_scaled = np.asarray(rope_inv_freq(cfg))
    f_base = np.asarray(rope_inv_freq(base))
    assert np.all(f_scaled <= f_base + 1e-9)
    assert f_scaled[-1] < f_base[-1] / 2  # long wavelengths stretched
    assert np.allclose(f_scaled[0], f_base[0])  # short ones kept

    params = init_params(cfg, jax.random.PRNGKey(0))
    prompt = np.zeros((1, 128), np.int32)
    prompt[0, :90] = (np.arange(90) * 3 + 1) % 256
    pt = jnp.asarray([0, 1, 2, -1], jnp.int32)
    cache = init_cache(cfg, 8, 64)
    logits, cache = prefill(params, jnp.asarray(prompt), cfg, cache, pt,
                            prompt_len=90, interpret=True)
    nxt = jnp.asarray([int(jnp.argmax(logits))], jnp.int32)
    d_logits, _ = decode_step(params, nxt, cfg, cache,
                              jnp.asarray([91], jnp.int32), pt[None, :],
                              interpret=True)
    # Teacher-force through the scaled dense model.
    toks = list(prompt[0, :90]) + [int(nxt[0])]
    arr = np.zeros((1, 128), np.int32)
    arr[0, :91] = toks
    ref = forward(params, jnp.asarray(arr), cfg)[0, 90]
    err = float(jnp.max(jnp.abs(d_logits[0] - ref)))
    assert err < 0.07, err
    # And the scaling must matter: unscaled forward differs.
    ref_base = forward(params, jnp.asarray(arr), base)[0, 90]
    assert float(jnp.max(jnp.abs(ref - ref_base))) > 0.01


@pytest.mark.slow
def test_remat_layers():
    """Per-layer jax.checkpoint: identical grads, recomputation in backward.

    (Peak-memory reduction is scheduler-dependent and validated on real
    hardware; here we pin the structure — one remat region per layer, extra
    backward dots — and exact gradient equality.)
    """
    from flash_attention_from_scratch_tpu.models.llama import (
        LlamaConfig, init_params, loss_fn)

    cfg = LlamaConfig(vocab_size=256, dim=256, n_layers=3, n_heads=2,
                      n_kv_heads=1, d_head=128, hidden_dim=512,
                      block_q=128, block_kv=128)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 129), 0, 256)

    g0 = jax.grad(lambda p: loss_fn(p, tokens, cfg, interpret=True))(params)
    g1 = jax.grad(lambda p: loss_fn(p, tokens, cfg, interpret=True,
                                    remat=True))(params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32)))), g0, g1)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5

    jx0 = str(jax.make_jaxpr(jax.grad(
        lambda p: loss_fn(p, tokens, cfg, interpret=True)))(params))
    jx1 = str(jax.make_jaxpr(jax.grad(
        lambda p: loss_fn(p, tokens, cfg, interpret=True, remat=True)))(params))
    assert jx0.count("remat") == 0
    assert jx1.count("remat") == cfg.n_layers
    assert jx1.count("dot_general") > jx0.count("dot_general")


def test_gpt_oss_style_training():
    """GPT-OSS-shaped config: attention sinks + alternating local/global
    windows, trained end-to-end (VERDICT r3 #7). The sink logits must
    receive nonzero gradient and the loss must stay finite."""
    import dataclasses

    cfg = dataclasses.replace(CFG, attn_sinks=True, window_pattern=(96, 0))
    params = init_params(cfg, jax.random.PRNGKey(3))
    assert params["layers"][0]["attn_sinks"].shape == (cfg.n_heads,)
    tokens = jax.random.randint(jax.random.PRNGKey(4), (2, 129), 0,
                                cfg.vocab_size)
    loss, grads = jax.value_and_grad(lambda p: loss_fn(p, tokens, cfg))(params)
    assert jnp.isfinite(loss)
    gz = grads["layers"][0]["attn_sinks"]
    assert gz.shape == (cfg.n_heads,)
    assert jnp.isfinite(gz).all()
    assert float(jnp.abs(gz).max()) > 0.0
    gq = grads["layers"][1]["wq"]
    assert jnp.isfinite(gq).all() and float(jnp.abs(gq).max()) > 0.0
