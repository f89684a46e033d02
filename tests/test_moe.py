"""Mixture-of-Experts layer: routing invariants, dense-oracle equivalence,
expert-parallel sharding, and gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_from_scratch_tpu.models.moe import (
    MoEConfig,
    _capacity,
    _moe_mlp,
    _route,
    init_moe_params,
    moe_forward,
    moe_loss_fn,
    moe_param_specs,
    shard_moe_params,
)

CFG = MoEConfig(vocab_size=128, dim=256, n_layers=2, n_heads=2, n_kv_heads=1,
                d_head=128, hidden_dim=128, block_q=128, block_kv=128,
                n_experts=4, expert_top_k=2)


@pytest.fixture(scope="module")
def params():
    return init_moe_params(CFG, jax.random.PRNGKey(0))


def test_route_shapes_and_conservation():
    """Every surviving route lands in exactly one (expert, slot) bin and
    combine weights per token sum to <= 1 (== 1 when nothing is dropped)."""
    key = jax.random.PRNGKey(1)
    gates = jax.nn.softmax(jax.random.normal(key, (64, CFG.n_experts)))
    cap = _capacity(CFG, 64)
    dispatch, combine, aux = _route(CFG, gates, cap)
    assert dispatch.shape == (64, CFG.n_experts, cap)
    # 0/1 dispatch; at most one slot per (token, expert).
    assert set(np.unique(np.asarray(dispatch))) <= {0.0, 1.0}
    assert np.all(np.asarray(dispatch.sum(axis=-1)) <= 1)
    # Each expert slot is claimed by at most one token.
    assert np.all(np.asarray(dispatch.sum(axis=0)) <= 1)
    # Capacity is ample here: every token keeps top_k routes, weights sum 1.
    per_token = np.asarray(combine.sum(axis=(1, 2)))
    np.testing.assert_allclose(per_token, 1.0, atol=1e-5)
    routes = np.asarray(dispatch.sum(axis=(1, 2)))
    assert np.all(routes == CFG.expert_top_k)
    assert float(aux) > 0


def test_route_drops_over_capacity():
    """With capacity 8, an expert everyone wants keeps only 8 tokens."""
    gates = jnp.zeros((32, CFG.n_experts)).at[:, 0].set(1.0)
    dispatch, combine, _ = _route(
        dataclasses_replace_topk(CFG, 1), gates, 8)
    kept = np.asarray(dispatch[:, 0].sum())
    assert kept == 8
    # Dropped tokens (the first over-capacity token included) have zero
    # combine weight everywhere.
    assert np.asarray(combine.sum(axis=(1, 2)))[8:].max() == 0.0


def dataclasses_replace_topk(cfg, k):
    import dataclasses
    return dataclasses.replace(cfg, expert_top_k=k)


def test_moe_mlp_matches_dense_oracle(params):
    """top_k == n_experts with ample capacity == dense weighted mixture.

    When every token visits every expert, the routed layer must equal
    sum_e gate_e * SwiGLU_e(x) computed naively.
    """
    import dataclasses
    cfg = dataclasses.replace(CFG, expert_top_k=CFG.n_experts,
                              capacity_factor=float(CFG.n_experts))
    layer = params["layers"][0]
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, CFG.dim),
                          jnp.float32).astype(jnp.bfloat16)
    out, _ = _moe_mlp(cfg, layer, x)

    xt = x.reshape(-1, CFG.dim)
    gates = jax.nn.softmax(xt.astype(jnp.float32) @ layer["router"], -1)
    w = layer["experts"]
    ref = jnp.zeros_like(xt, dtype=jnp.float32)
    for e in range(cfg.n_experts):
        g = jax.nn.silu((xt @ w["w_gate"][e]).astype(jnp.float32))
        h = g.astype(x.dtype) * (xt @ w["w_up"][e])
        ref = ref + gates[:, e:e + 1] * (h @ w["w_down"][e]).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(out.reshape(-1, CFG.dim).astype(jnp.float32) - ref)))
    assert err < 0.05, err


@pytest.mark.slow
def test_moe_forward_and_grad(params):
    tokens = jax.random.randint(jax.random.PRNGKey(3), (2, 129), 0,
                                CFG.vocab_size)
    loss, grads = jax.value_and_grad(moe_loss_fn)(params, tokens, CFG)
    assert jnp.isfinite(loss)
    # Router and expert weights both receive gradient.
    g = grads["layers"][0]
    assert float(jnp.abs(g["router"]).max()) > 0
    assert float(jnp.abs(g["experts"]["w_down"]).max()) > 0


def test_expert_parallel_sharding_matches_single_device(cpu_mesh_devices):
    """ep-sharded expert layer == single-device (GSPMD all-to-alls).

    fp32 end to end and direct activations (not a whole bf16 model): with
    identical replicated router inputs the routing is bit-stable, so the
    only sharding-induced differences are fp32 contraction-order noise. A
    full bf16 model comparison is NOT valid here — reassociation flips
    near-tie routing decisions, which is inherent to MoE, not a bug.
    """
    import dataclasses

    from jax.sharding import Mesh

    from flash_attention_from_scratch_tpu.ops.configs import DType

    cfg = dataclasses.replace(CFG, dtype=DType.FP32)
    params32 = init_moe_params(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 64, cfg.dim), jnp.float32)
    # Pin the reference to one CPU device: with a TPU attached it is the
    # default backend, and TPU-vs-CPU matmul differences would swamp the
    # sharding comparison this test is about.
    cpu0 = cpu_mesh_devices[0]
    layer = jax.device_put(params32["layers"][0], cpu0)
    x = jax.device_put(x, cpu0)
    out_ref, aux_ref = jax.jit(lambda l, x: _moe_mlp(cfg, l, x))(layer, x)

    specs = moe_param_specs(params32)
    assert (specs["layers"][0]["experts"]["w_gate"]
            == jax.sharding.PartitionSpec("ep"))

    mesh = Mesh(np.asarray(cpu_mesh_devices[:4]).reshape(4), ("ep",))
    with mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharded = shard_moe_params(params32, mesh)
        x_rep = jax.device_put(x, NamedSharding(mesh, P()))
        out, aux = jax.jit(
            lambda l, x: _moe_mlp(cfg, l, x))(sharded["layers"][0], x_rep)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-5)


@pytest.mark.slow
def test_moe_decode_matches_forward(params):
    """MoE through the paged decode path: server tokens teacher-force
    against moe_forward (the same capacity-padded routing)."""
    from flash_attention_from_scratch_tpu.serving.generate import (
        GenerationServer)

    prompts = {1: list(range(10, 30)), 2: list(range(40, 45))}
    server = GenerationServer(params, CFG, num_pages=32, page_size=64,
                              max_batch=2, pages_per_seq=8)
    for sid, p in prompts.items():
        server.submit(sid, p, 4)
    got = server.run()

    def naive_logits(tokens):
        s = len(tokens)
        pad = s + (-s) % 128
        arr = np.zeros((1, pad), np.int32)
        arr[0, :s] = tokens
        logits, _aux = moe_forward(params, jnp.asarray(arr), CFG)
        return logits[0, s - 1]

    for sid, p in prompts.items():
        assert len(got[sid]) == 4, (sid, got[sid])
        toks = list(p)
        for g in got[sid]:
            logits = naive_logits(toks)
            gap = float(logits.max() - logits[g])
            # Routing capacity differs between the batched decode step and
            # the single-prompt recompute, so allow real slack — but the
            # served token must still be near-argmax of the dense model.
            assert gap <= 0.25, (sid, toks, g, int(jnp.argmax(logits)), gap)
            toks.append(g)
