"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from flash_attention_from_scratch_tpu.ops.configs import KernelConfig
from flash_attention_from_scratch_tpu.ops.flash_forward import flash_forward
from flash_attention_from_scratch_tpu.parallel.mesh import (
    llama_param_specs, make_mesh, shard_params,
)
from flash_attention_from_scratch_tpu.parallel.sharded_attention import (
    shard_mapped_attention,
)
from flash_attention_from_scratch_tpu.utils.testing import generate_qkv


@pytest.fixture(scope="module")
def mesh(cpu_mesh_devices):
    return make_mesh(2, 4, devices=cpu_mesh_devices)


def test_shard_mapped_attention_matches_single_device(mesh):
    cfg = KernelConfig(block_q=128, block_kv=128)
    q, k, v = generate_qkv(256, n_heads=4, batch=2, dtype=jnp.bfloat16)
    put = lambda x: jax.device_put(x, NamedSharding(mesh, P("dp", "tp", None, None)))
    out_sharded = shard_mapped_attention(put(q), put(k), put(v), cfg, mesh,
                                         interpret=True)
    out_single = flash_forward(q, k, v, cfg, interpret=True)
    # Not bitwise: XLA vectorizes exp differently for the sharded shapes;
    # allow 1-2 bf16 ulps.
    np.testing.assert_allclose(
        np.asarray(out_sharded, np.float32), np.asarray(out_single, np.float32),
        atol=8e-3, rtol=2e-2,
    )


def test_shard_mapped_attention_sinks(mesh):
    """Per-head sinks shard with the head axis (round 5): forward parity
    and gradients — dsinks needs the dp-axis psum from shard_map's
    transpose — against the single-device autodiff path."""
    from flash_attention_from_scratch_tpu.ops.autodiff import flash_attention

    cfg = KernelConfig(block_q=128, block_kv=128, causal=True)
    q, k, v = generate_qkv(256, n_heads=4, batch=2, dtype=jnp.bfloat16)
    z = jnp.linspace(-0.5, 0.75, 4).astype(jnp.float32)
    put = lambda x: jax.device_put(x, NamedSharding(mesh, P("dp", "tp", None, None)))
    putz = lambda x: jax.device_put(x, NamedSharding(mesh, P("tp")))
    out_sharded = shard_mapped_attention(put(q), put(k), put(v), cfg, mesh,
                                         interpret=True, sinks=putz(z))
    out_single = flash_attention(q, k, v, cfg, True, z)
    np.testing.assert_allclose(
        np.asarray(out_sharded, np.float32), np.asarray(out_single, np.float32),
        atol=8e-3, rtol=2e-2,
    )
    do = generate_qkv(256, n_heads=4, batch=2, dtype=jnp.bfloat16, seed=3)[0]

    def loss_sharded(q, k, v, z):
        return jnp.sum(shard_mapped_attention(
            q, k, v, cfg, mesh, interpret=True, sinks=z) * put(do))

    g_sh = jax.grad(loss_sharded, argnums=(0, 1, 2, 3))(
        put(q), put(k), put(v), putz(z))
    g_single = jax.grad(
        lambda q, k, v, z: jnp.sum(flash_attention(q, k, v, cfg, True, z)
                                   * do), argnums=(0, 1, 2, 3))(q, k, v, z)
    for name, a, b in zip(("q", "k", "v", "sinks"), g_sh, g_single):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=2e-2, rtol=5e-2, err_msg=f"d{name}")


def test_sharded_train_step(mesh):
    from flash_attention_from_scratch_tpu.models.llama import LlamaConfig, init_params
    from flash_attention_from_scratch_tpu.models.train import (
        make_optimizer, make_train_step,
    )

    cfg = LlamaConfig(vocab_size=128, dim=512, n_layers=1, n_heads=4, n_kv_heads=4,
                      d_head=128, hidden_dim=256, block_q=128, block_kv=128)
    params = shard_params(init_params(cfg, jax.random.PRNGKey(0)), mesh)
    opt = make_optimizer()
    opt_state = opt.init(params)
    tokens = jax.device_put(
        jax.random.randint(jax.random.PRNGKey(1), (4, 129), 0, cfg.vocab_size),
        NamedSharding(mesh, P("dp", None)),
    )
    step = jax.jit(make_train_step(cfg, opt, interpret=True, mesh=mesh))
    with mesh:
        params2, _, loss = step(params, opt_state, tokens)
    assert jnp.isfinite(loss)
    # Params must actually change and keep their sharding.
    delta = jnp.abs(params2["layers"][0]["wq"] - params["layers"][0]["wq"]).max()
    assert float(delta) > 0
    assert params2["layers"][0]["wq"].sharding.spec == P(None, "tp")


def test_param_specs_cover_tree(mesh):
    from flash_attention_from_scratch_tpu.models.llama import LlamaConfig, init_params

    cfg = LlamaConfig(vocab_size=64, dim=256, n_layers=2, n_heads=2, n_kv_heads=2,
                      d_head=128, hidden_dim=128)
    params = init_params(cfg, jax.random.PRNGKey(0))
    specs = llama_param_specs(params)
    # Same tree structure — every param gets a spec.
    jax.tree_util.tree_map(lambda a, b: None, params, specs)
