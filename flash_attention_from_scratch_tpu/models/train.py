"""Training step: AdamW over the Llama loss, pjit-ready.

Extension beyond the forward-only reference. The step is a plain jittable
function of (params, opt_state, tokens); under a mesh, param shardings come
from ``parallel.mesh.llama_param_specs`` and the attention kernel is
shard_mapped — everything else is GSPMD.
"""

from __future__ import annotations

import jax
import optax

from .llama import LlamaConfig, loss_fn

__all__ = ["make_train_step", "make_optimizer"]


def make_optimizer(lr: float = 3e-4, weight_decay: float = 0.1):
    return optax.adamw(lr, b1=0.9, b2=0.95, weight_decay=weight_decay)


def make_train_step(cfg: LlamaConfig, optimizer=None, interpret=None,
                    mesh=None, remat: bool = False):
    """Returns ``step(params, opt_state, tokens) -> (params, opt_state, loss)``.

    Not jitted here: callers wrap in ``jax.jit`` with their shardings (the
    driver's multichip dry run does; bench paths jit with defaults).
    ``remat=True`` checkpoints each layer (see ``llama.forward``).
    """
    if optimizer is None:
        optimizer = make_optimizer()

    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, tokens, cfg, interpret=interpret, mesh=mesh,
                              remat=remat)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
