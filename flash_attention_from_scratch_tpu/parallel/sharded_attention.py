"""Multi-chip attention: shard_map over (batch, heads) + ring attention hooks.

GSPMD cannot partition a ``pallas_call`` custom call, so the kernel is
wrapped in ``shard_map``: batch over the data axis, heads over the model
axis. Attention is embarrassingly parallel over both, so the forward needs
no collectives; the surrounding dense layers' all-reduces are inserted by
GSPMD from the param specs (``mesh.llama_param_specs``).

This is a new TPU-first subsystem — the reference has no distributed code
(SURVEY.md §5.7/5.8).
"""

from __future__ import annotations

from functools import partial

import jax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.autodiff import flash_attention
from ..ops.configs import KernelConfig
from .mesh import DATA_AXIS, MODEL_AXIS, mesh_interpret

__all__ = ["shard_mapped_attention"]


def shard_mapped_attention(q, k, v, cfg: KernelConfig, mesh: Mesh,
                           interpret: bool | None = None, sinks=None):
    """Flash attention with batch sharded over dp and heads over tp.

    Inputs are (batch, heads, seq, d_head) global arrays; each device runs
    the single-chip kernel on its (batch/dp, heads/tp) shard. ``sinks``
    ((heads,) fp32, optional) are per-head, i.e. sharded like the head
    axis: each shard consumes (and differentiates) its local head-slice;
    the sink-gradient's batch sum over the data axis is psummed by
    shard_map's transpose of the replicated-axis input.
    """
    interpret = mesh_interpret(mesh, interpret)
    spec = P(DATA_AXIS, MODEL_AXIS, None, None)
    sink_spec = P(MODEL_AXIS)

    if sinks is None:

        @partial(
            shard_map, mesh=mesh,
            in_specs=(spec, spec, spec), out_specs=spec,
            check_rep=False,
        )
        def _local(q, k, v):
            return flash_attention(q, k, v, cfg, interpret)

        return _local(q, k, v)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, spec, sink_spec), out_specs=spec,
        check_rep=False,
    )
    def _local_sinks(q, k, v, sinks):
        return flash_attention(q, k, v, cfg, interpret, sinks)

    return _local_sinks(q, k, v, sinks)
