"""Weight-only quantized matmul vs dequantized jnp oracle."""

import jax
import jax.numpy as jnp
import pytest

from flash_attention_from_scratch_tpu.ops.quant_matmul import (
    QuantizedWeight, quant_matmul, quantize_weight,
)


def _mk(m, k, n, seed=0):
    kx, kw = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(kx, (m, k), jnp.float32).astype(jnp.bfloat16)
    w = (jax.random.normal(kw, (k, n), jnp.float32) / jnp.sqrt(k)).astype(jnp.bfloat16)
    return x, w


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_quantize_roundtrip(mode):
    _, w = _mk(8, 256, 256)
    wq = quantize_weight(w, mode)
    err = jnp.max(jnp.abs(wq.dequantize().astype(jnp.float32) - w.astype(jnp.float32)))
    # Half a quantization step per channel, plus one bf16 ulp of the values
    # (dequantize() rounds back to the original dtype).
    bound = 0.5 * wq.scales.max() + 0.008 * jnp.max(jnp.abs(w).astype(jnp.float32))
    assert err <= bound, (float(err), float(bound))


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_quant_matmul_kernel(mode):
    m, k, n = 256, 1024, 512
    x, w = _mk(m, k, n)
    wq = quantize_weight(w, mode)
    got = quant_matmul(x, wq, block_m=128, block_k=256, block_n=256)
    want = x.astype(jnp.float32) @ wq.dequantize().astype(jnp.float32)
    err = jnp.max(jnp.abs(got.astype(jnp.float32) - want))
    assert err < 0.15 * jnp.max(jnp.abs(want)) + 0.1, float(err)
    # Tight check vs the same math in fp32.
    rel = err / (jnp.max(jnp.abs(want)) + 1e-9)
    assert rel < 0.05, float(rel)


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_quant_matmul_act_quant_kernel(mode):
    """W8A8/W4A8 kernel vs the same math in exact integer arithmetic."""
    from flash_attention_from_scratch_tpu.ops.quant_matmul import (
        _stored_int8_columns, quantize_activations,
    )
    import numpy as np

    m, k, n = 16, 512, 256
    x, w = _mk(m, k, n, seed=4)
    wq = quantize_weight(w, mode, act="int8")
    got = quant_matmul(x, wq, block_m=16, block_k=128, block_n=128,
                       act_quant=True)
    x_q, xs = quantize_activations(x)
    acc = np.asarray(x_q, np.int64) @ np.asarray(_stored_int8_columns(wq),
                                                 np.int64)
    want = (acc.astype(np.float64) * np.asarray(xs, np.float64)
            * np.asarray(wq.scales, np.float64)[None, :])
    err = np.max(np.abs(np.asarray(got, np.float64) - want))
    # int32 accumulation is exact; the only error is the bf16 output cast.
    assert err <= 0.008 * np.max(np.abs(want)), float(err)
    # And the result approximates the dequantized matmul to quant error.
    dense = np.asarray(x, np.float64) @ np.asarray(wq.dequantize(), np.float64)
    rel = np.max(np.abs(np.asarray(got, np.float64) - dense)) / np.max(np.abs(dense))
    assert rel < 0.05, float(rel)


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_quant_matmul_act_quant_ragged_matches_kernel_math(mode):
    """The ragged fallback uses the same int math as the a8 kernel."""
    x, w = _mk(3, 256, 256, seed=5)
    wq = quantize_weight(w, mode, act="int8")
    got = quant_matmul(x, wq, act_quant=True)
    want = x.astype(jnp.float32) @ wq.dequantize().astype(jnp.float32)
    assert jnp.max(jnp.abs(got.astype(jnp.float32) - want)) < 0.08


def test_quantized_weight_act_roundtrip():
    _, w = _mk(8, 256, 256, seed=6)
    wq = quantize_weight(w, "int8", act="int8")
    leaves, treedef = jax.tree_util.tree_flatten(wq)
    back = jax.tree_util.tree_unflatten(treedef, leaves)
    assert back.act == "int8" and back.mode == "int8"


def test_quant_matmul_n_inner_matches_n_outer():
    """The K-outer/N-inner walk is numerically identical to the default."""
    m, k, n = 8, 1024, 512
    x, w = _mk(m, k, n, seed=3)
    wq = quantize_weight(w, "int8")
    base = quant_matmul(x, wq, block_m=8, block_k=256, block_n=256)
    swept = quant_matmul(x, wq, block_m=8, block_k=256, block_n=256,
                         n_inner=True)
    assert jnp.array_equal(base.astype(jnp.float32),
                           swept.astype(jnp.float32))


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_quant_matmul_fallback_ragged(mode):
    """Non-MXU-aligned M takes the fused XLA path and stays correct."""
    x, w = _mk(3, 256, 256, seed=1)
    wq = quantize_weight(w, mode)
    got = quant_matmul(x, wq)
    want = x.astype(jnp.float32) @ wq.dequantize().astype(jnp.float32)
    assert jnp.max(jnp.abs(got.astype(jnp.float32) - want)) < 0.05


def test_quant_matmul_batched_input():
    x, w = _mk(8, 256, 384, seed=2)
    x3 = x.reshape(2, 4, 256)
    wq = quantize_weight(w, "int8")
    got = quant_matmul(x3, wq)
    assert got.shape == (2, 4, 384)
    want = quant_matmul(x, wq).reshape(2, 4, 384)
    assert jnp.allclose(got.astype(jnp.float32), want.astype(jnp.float32))


def test_partitioned_quant_matmul_tp():
    """custom_partitioning: the quant kernel runs shard-locally under GSPMD.

    Column-parallel must be bit-identical to the single-device kernel (no
    collectives); row-parallel (int8) psums exact partials; int4
    row-parallel is rejected by design.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    import flash_attention_from_scratch_tpu.ops.quant_matmul as qm
    from flash_attention_from_scratch_tpu.ops.quant_matmul import (
        quant_matmul, quantize_weight, spmd_partition_mode)
    from flash_attention_from_scratch_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(1, 4, devices=jax.devices("cpu")[:4])
    k, n, m = 512, 1024, 16
    w = (jax.random.normal(jax.random.PRNGKey(0), (k, n), jnp.float32)
         * 0.05).astype(jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (m, k),
                          jnp.float32).astype(jnp.bfloat16)

    def shard(wq, vspec):
        sspec = P(vspec[1]) if len(vspec) > 1 and vspec[1] else P()
        return qm.QuantizedWeight(
            jax.device_put(wq.values, NamedSharding(mesh, vspec)),
            jax.device_put(wq.scales, NamedSharding(mesh, sspec)),
            wq.mode, wq.orig_dtype, wq.act)

    for mode, act, vspec, tol in [
        ("int8", False, P(None, "tp"), 0.0),
        ("int8", False, P("tp", None), 1e-6),
        ("int8", True, P(None, "tp"), 2e-2),
        ("int4", False, P(None, "tp"), 0.0),
    ]:
        wq = quantize_weight(w, mode, "int8" if act else "bf16")
        ref = quant_matmul(x, wq, act_quant=act)
        wq_s = shard(wq, vspec)

        def f(x, wq_s=wq_s, act=act):
            with spmd_partition_mode():
                return quant_matmul(x, wq_s, act_quant=act)

        out = jax.jit(f)(jax.device_put(x, NamedSharding(mesh, P())))
        assert out.dtype == x.dtype, (mode, act, out.dtype)  # no f32 widening
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        assert err <= tol, (mode, act, tuple(vspec), err)

    # int4 row-parallel: the nibble pairing cannot shard on K — the rule
    # gives the packed dim its own factor, so Shardy resolves a K-sharded
    # weight by replicating it. Correct output, no sharding (and
    # shard_params rejects this layout up front anyway).
    wq4 = quantize_weight(w, "int4", "bf16")
    wq4_s = shard(wq4, P("tp", None))

    def g(x):
        with spmd_partition_mode():
            return quant_matmul(x, wq4_s)

    ref4 = quant_matmul(x, wq4)
    out4 = jax.jit(g)(jax.device_put(x, NamedSharding(mesh, P())))
    assert float(jnp.max(jnp.abs(out4.astype(jnp.float32)
                                 - ref4.astype(jnp.float32)))) < 1e-6
