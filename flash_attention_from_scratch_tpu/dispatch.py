"""Runtime dispatch and hermetic timing.

Analogue of the reference's host layer (``src/flash_attention.cu:34-150``):
input validation, config -> kernel lookup, launch, and the optional
cudaEvent timing path (``forward_timed``). On TPU the dispatch table is
``jax.jit``'s specialization cache plus an ``lru_cache`` over
(config, shape) — no codegen, no ``std::map``.
"""

from __future__ import annotations

import functools
import time

import jax

from .ops.configs import KernelConfig
from .ops.flash_forward import flash_forward

__all__ = ["forward_timed", "median_runtime", "chain_runtime", "sync"]


def sync(x):
    """Force completion of ``x`` by reading one element back to the host.

    ``block_until_ready`` alone is not a reliable fence on tunneled device
    platforms (observed: a 1.1-TFLOP matmul "completing" in 29us on axon);
    a host readback of a single element is. The analogue of the reference's
    cudaEvent synchronization (``flash_attention.cu:114-132``).
    """
    leaf = jax.tree_util.tree_leaves(x)[0]
    jax.device_get(leaf[(0,) * leaf.ndim])
    return x


def forward_timed(q, k, v, cfg: KernelConfig | None = None, *, scale=None,
                  warmup: int = 2, iters: int = 10):
    """Run the kernel and return (output, median_seconds_per_call).

    The analogue of ``forward_timed`` / the benchmark=true cudaEvent path
    (``flash_attention.cu:114-132``): compile + warm up first, then time
    synchronous dispatches with ``block_until_ready`` fencing. Uses the
    median, which is robust to the occasional host hiccup.

    When the output has Q's shape/dtype (self-attention), each timed
    dispatch feeds its output back in as the next Q: the relay has been
    observed to occasionally serve streams of *identical* dispatches ~40%
    too fast (whole 10-sample trials reading 304 "TFLOP/s" at seq 4096),
    and a data dependence between consecutive calls makes that impossible
    by construction. Kernel runtime is value-independent, so the chain
    does not bias the number.
    """
    out = sync(flash_forward(q, k, v, cfg, scale=scale))
    chain_fn = None
    if out.shape == q.shape and out.dtype == q.dtype:
        def chain_fn(prev):
            return flash_forward(prev, k, v, cfg, scale=scale)
    runtime = median_runtime(
        lambda: flash_forward(q, k, v, cfg, scale=scale),
        warmup=warmup, iters=iters, chain_fn=chain_fn,
    )
    return out, runtime


@functools.lru_cache(maxsize=1)
def sync_overhead() -> float:
    """Median cost of one host-readback fence (measured ~35-44 ms through the
    axon tunnel — larger than many kernels, so it must be calibrated out)."""
    import jax.numpy as jnp

    trivial = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128), jnp.float32)
    sync(trivial(x))
    samples = []
    for _ in range(7):
        t0 = time.perf_counter()
        sync(trivial(x))
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return samples[len(samples) // 2]


def chain_runtime(step_fn, x0, *args, steps: int | None = None, iters: int = 5,
                 est_secs: float | None = None) -> float:
    """Pure device seconds per ``step_fn`` call: N chained calls in ONE jit.

    ``step_fn(x, *args) -> y`` must preserve x's shape/dtype (self-attention
    does: the output re-enters as the next Q). The chain is UNROLLED inside
    one jit, so per-dispatch host/tunnel cost is paid once per *trial*, not
    once per call — the measurement the reference gets from NCU kernel
    Duration (``ncu_bench.py:31-56``) and this repo's decode bench gets from
    ``decode_loop``. Two chain lengths (N and 2N) are timed and the slope
    taken, so even that single fixed dispatch+fence cost cancels exactly;
    the chain's data dependence also defeats the identical-dispatch relay
    artifact by construction (see :func:`median_runtime`).

    Unrolled, NOT ``lax.scan``: a while-loop carry round-trips through a
    fixed buffer each iteration, and the kernel's custom call cannot alias
    its input, so XLA inserts a full-carry copy per step — measured 0.72 ms
    (5.6%) on a 268 MB carry at seq 4096 on v5e. The unrolled chain is pure
    dataflow and times the kernel alone.

    Loop-invariant operands (K, V) must come through ``*args``, NOT a
    closure: closed-over arrays trace as jaxpr *constants* and ship inside
    the compile request, which a tunneled compile service rejects for
    multi-hundred-MB tensors (observed: HTTP 413 at seq >= 2048 batch 16).

    Use for sub-millisecond kernels (small seq_len) where host-side
    enqueueing is comparable to kernel runtime; host timing has also been
    observed to over-report ~40% through the relay even with value-chained
    dispatches, so this is the default benchmark timer.
    """
    if steps is None:
        if est_secs is None:
            # One rough host-fenced sample to size the chain.
            sync(step_fn(x0, *args))
            t0 = time.perf_counter()
            sync(step_fn(x0, *args))
            est_secs = max(time.perf_counter() - t0 - sync_overhead(), 1e-5)
        # Aim for ~120 ms of *difference* between the two chain lengths:
        # the t2 - t1 slope divides fence noise by `steps`, and the tunnel
        # fence has a positive heavy tail of several ms — at steps=4 that
        # was measured leaking +-8% into seq-4096 numbers (one run read
        # 204 TFLOP/s, above nominal SoL). Floor 8, cap 128 (compile time
        # of the unrolled chain).
        steps = int(min(max(0.12 / est_secs, 8), 128))

    def chained(n):
        @jax.jit
        def run(x, *a):
            for _ in range(n):
                x = step_fn(x, *a)
            return x
        return run

    f1, f2 = chained(steps), chained(2 * steps)
    for attempt in (0, 1):
        try:
            sync(f1(x0, *args))  # compile + warm
            sync(f2(x0, *args))
            break
        except jax.errors.JaxRuntimeError:
            # The tunneled remote-compile service intermittently drops a
            # response mid-body ("response body closed before all bytes
            # were read"), killing multi-hour sweeps on one flake. One
            # retry re-issues the compile (the service caches server-side).
            if attempt:
                raise
            time.sleep(5.0)
    t1s, t2s = [], []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(f1(x0, *args))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        sync(f2(x0, *args))
        t2s.append(time.perf_counter() - t0)
    # Median, not min: trial noise is MOSTLY additive (fence jitter, host
    # hiccups), but the relay has also been seen to serve a repeated
    # identical dispatch artificially fast — an entire lucky trial — and a
    # min *selects* that artifact (observed: one autotune row reading
    # 203 TFLOP/s, above the matmul ceiling). The median resists both
    # tails; with steps >= 8 the residual fence noise in the slope is
    # under ~1%.
    t1s.sort()
    t2s.sort()
    t1, t2 = t1s[len(t1s) // 2], t2s[len(t2s) // 2]
    return max((t2 - t1) / steps, 1e-9)


def median_runtime(fn, *, warmup: int = 2, iters: int = 5, inner: int | None = None,
                   chain_fn=None) -> float:
    """Median device seconds per ``fn()`` call.

    Each sample enqueues ``inner`` back-to-back dispatches and fences once;
    the calibrated fence cost (:func:`sync_overhead`) is subtracted from the
    sample. ``inner`` is auto-chosen so the fence bias is <~2% even for
    microsecond kernels. Median over ``iters`` samples resists host hiccups.

    ``chain_fn(prev_result) -> result``, when given, produces dispatch i+1
    from dispatch i's output instead of repeating ``fn()``. Streams of
    byte-identical dispatches through the axon relay have been observed to
    complete impossibly fast (above the chip's measured matmul ceiling) for
    entire trials; a value chain forces real serial execution, which a
    median cannot recover once more than half the samples are poisoned.
    """
    for _ in range(warmup):
        sync(fn())
    ovh = sync_overhead()
    if inner is None:
        # Rough single sample to size the batch.
        t0 = time.perf_counter()
        sync(fn())
        rough = max(time.perf_counter() - t0 - ovh, 1e-5)
        # Enough enqueued dispatches that the (~40 ms tunnel) fence is <10%
        # of the sample even for sub-millisecond kernels.
        inner = int(min(max(10 * ovh / rough, 4), 512))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn()
        for _ in range(inner - 1):
            r = chain_fn(r) if chain_fn is not None else fn()
        sync(r)
        times.append((time.perf_counter() - t0 - ovh) / inner)
    times.sort()
    return max(times[len(times) // 2], 1e-9)
