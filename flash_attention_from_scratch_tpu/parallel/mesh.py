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

__all__ = ["make_mesh", "llama_param_specs", "shard_params", "pin_residual",
           "mesh_interpret", "DATA_AXIS", "MODEL_AXIS"]

DATA_AXIS = "dp"
MODEL_AXIS = "tp"


def mesh_interpret(mesh, interpret=None) -> bool:
    """Resolve ``interpret=None`` against the MESH's devices, not the
    process default backend.

    On a TPU-attached dev box ``jax.default_backend()`` is "tpu" even when
    the computation targets a virtual-CPU mesh (conftest adds 8 host
    devices for sharding tests), so backend-based resolution would compile
    Pallas kernels for CPU and crash. The mesh says where the kernel
    actually runs.
    """
    if interpret is not None:
        return interpret
    devices = getattr(mesh, "devices", None) if mesh is not None else None
    if devices is not None:
        # Concrete Mesh. AbstractMesh (jax.sharding.use_mesh /
        # get_abstract_mesh flows) has no .devices — fall through to the
        # process default backend for those.
        return devices.flat[0].platform == "cpu"
    if mesh is not None:
        # AbstractMesh can't say where it will run; the process default
        # backend is a guess (and the wrong one for a virtual-CPU
        # AbstractMesh on a TPU-attached box). Warn so the silent fallback
        # is diagnosable; pass interpret= explicitly to silence.
        import warnings

        warnings.warn(
            "mesh_interpret: mesh has no .devices (AbstractMesh?); "
            "resolving interpret from the process default backend "
            f"({jax.default_backend()!r}) — pass interpret= explicitly "
            "if that is wrong for this mesh",
            stacklevel=2)
    return jax.default_backend() == "cpu"


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
            # (xla_force_host_platform_device_count) for sharding dry runs —
            # but never let that silently masquerade as accelerator timing.
            import warnings

            warnings.warn(
                f"make_mesh({dp}, {tp}): only {len(devices)} "
                f"{devices[0].platform} device(s); falling back to virtual "
                f"CPU devices — fine for dry runs, meaningless for timing",
                stacklevel=2)
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
    col, row = P(None, MODEL_AXIS), P(MODEL_AXIS, None)
    key_spec = {
        "attn_norm": P(), "mlp_norm": P(),
        "attn_post_norm": P(), "mlp_post_norm": P(),  # Gemma-2 sandwich
        "wq": col, "wk": col, "wv": col, "wo": row,
        # Qwen2-style QKV biases: column-parallel outputs, shard like the
        # projection's N dim.
        "bq": P(MODEL_AXIS), "bk": P(MODEL_AXIS), "bv": P(MODEL_AXIS),
        "bo": P(),  # adds to the (replicated) row-parallel output
        # GPT-OSS sink logits: per-Q-head, sharded with the head axis like
        # wq's columns (each shard consumes its local head-slice).
        "attn_sinks": P(MODEL_AXIS),
        "w_gate": col, "w_up": col, "w_down": row,
        # Fused projections (models.llama.fuse_projections). Column
        # sharding of the concatenated N is semantically fine under GSPMD
        # (slice boundaries need not align with shards); shard_map-manual
        # paths must use unfused params.
        "wqkv": col, "w_gate_up": col,
    }
    return {
        "embed": P(None, MODEL_AXIS),
        "final_norm": P(),
        "lm_head": P(None, MODEL_AXIS),
        "layers": [{k: key_spec[k] for k in layer}
                   for layer in params["layers"]],
    }


def pin_residual(x, mesh: Mesh, *, seq_dim=None):
    """Constrain an activation to be model-axis-replicated.

    Placed after each row-parallel matmul (wo, w_down) so GSPMD all-reduces
    the partial products exactly once there. Without the pin, GSPMD keeps
    the residual feature-sharded over tp and re-all-gathers it separately
    for every consumer — 3x for QKV plus 2x for gate|up per layer, observed
    in the compiled HLO of the tp decode step (21 all-gathers for a 2-layer
    model, vs the Megatron-minimal 2 all-reduces/layer after pinning).

    Keeps dp (batch, dim 0) and — when ``seq_dim`` is given — sp (sequence)
    placements intact; only the model axis is forced replicated.
    """
    parts = [None] * x.ndim
    if DATA_AXIS in mesh.axis_names:
        parts[0] = DATA_AXIS
    if seq_dim is not None and "sp" in mesh.axis_names:
        parts[seq_dim] = "sp"
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*parts)))


def shard_params(params, mesh: Mesh):
    """Place a params pytree onto the mesh per llama_param_specs.

    Quantized leaves (``QuantizedWeight``) shard their values like the dense
    weight; per-output-channel scales follow the weight's N-dim sharding
    (column-parallel -> scales over tp, row-parallel -> replicated).
    """
    from ..ops.quant_matmul import QuantizedWeight

    specs = llama_param_specs(params)

    def place(x, spec):
        if isinstance(x, QuantizedWeight):
            if x.mode == "int4" and len(spec) > 0 and spec[0] is not None:
                raise NotImplementedError(
                    "row-parallel sharding of packed int4 weights would split "
                    "the K-dim nibble pairing; use int8 for row-parallel "
                    "layers or reshard before quantizing")
            scale_spec = (P(spec[1]) if len(spec) > 1 and spec[1] is not None
                          else P())
            return QuantizedWeight(
                jax.device_put(x.values, NamedSharding(mesh, spec)),
                jax.device_put(x.scales, NamedSharding(mesh, scale_spec)),
                x.mode, x.orig_dtype)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(
        place, params, specs,
        is_leaf=lambda x: isinstance(x, QuantizedWeight))

