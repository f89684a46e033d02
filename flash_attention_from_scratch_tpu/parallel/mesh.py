"""Device mesh construction and Llama partition specs.

New TPU-first subsystem (the reference is single-GPU with no distributed
code — SURVEY.md §5.7/5.8): a named ``Mesh`` over (dp, tp) with
megatron-style tensor-parallel specs for the Llama params. Dense matmuls are
sharded by GSPMD from these specs; the Pallas attention kernel — which GSPMD
cannot partition — goes through ``sharded_attention.shard_mapped_attention``.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "llama_param_specs", "shard_params", "DATA_AXIS", "MODEL_AXIS"]

DATA_AXIS = "dp"
MODEL_AXIS = "tp"


def make_mesh(dp: int, tp: int, devices=None) -> Mesh:
    """(dp, tp) mesh. On real hardware the trailing (tp) axis should map to
    the fastest ICI ring; ``jax.experimental.mesh_utils`` does this when
    given the physical topology — for virtual/CPU meshes a reshape is fine.
    """
    n = dp * tp
    if devices is None:
        devices = jax.devices()
        if len(devices) < n:
            # A TPU-attached dev box still exposes virtual CPU devices
            # (xla_force_host_platform_device_count) for sharding dry runs.
            devices = jax.devices("cpu")
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh((dp, tp), devices=devices[:n])
    except Exception:
        arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def llama_param_specs(params) -> dict:
    """PartitionSpec pytree matching ``models.llama.init_params``.

    Megatron layout: QKV and MLP-in column-sharded over tp (head/hidden dim),
    projection-out and MLP-out row-sharded, norms replicated, embedding and
    LM head vocab/dim-sharded.
    """
    layer_spec = {
        "attn_norm": P(),
        "wq": P(None, MODEL_AXIS),
        "wk": P(None, MODEL_AXIS),
        "wv": P(None, MODEL_AXIS),
        "wo": P(MODEL_AXIS, None),
        "mlp_norm": P(),
        "w_gate": P(None, MODEL_AXIS),
        "w_up": P(None, MODEL_AXIS),
        "w_down": P(MODEL_AXIS, None),
    }
    return {
        "embed": P(None, MODEL_AXIS),
        "final_norm": P(),
        "lm_head": P(None, MODEL_AXIS),
        "layers": [dict(layer_spec) for _ in params["layers"]],
    }


def shard_params(params, mesh: Mesh):
    """Place a params pytree onto the mesh per llama_param_specs."""
    specs = llama_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
