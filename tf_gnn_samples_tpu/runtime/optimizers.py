"""Optimizers with TF1 semantics, written as pure pytree transforms.

The reference builds one of tf.train.{GradientDescent,RMSProp,Adam}Optimizer
and applies per-tensor `tf.clip_by_norm` gradient clipping
(models/sparse_graph_model.py:227-260). The learning rate may be scaled
per-batch by `num_graphs / lr_for_num_graphs_per_batch`
(sparse_graph_model.py:232-239) — a *traced* scalar under jit — so these
update rules take the effective lr as a runtime argument instead of baking
it into the transform (which rules out stock optax chains for RMSProp,
where lr enters the momentum accumulator).

Semantics matched:
* SGD:      theta -= lr * g
* Adam:     (beta1=0.9, beta2=0.999, eps=1e-8, eps OUTSIDE the sqrt)
            lr_t = lr * sqrt(1 - b2^t) / (1 - b1^t)
            m = b1*m + (1-b1)*g ; v = b2*v + (1-b2)*g^2
            theta -= lr_t * m / (sqrt(v) + eps)
* RMSProp:  (decay = params['learning_rate_decay'], momentum, eps=1e-10)
            ms  = decay*ms + (1-decay)*g^2
            mom = momentum*mom + lr * g / sqrt(ms + eps)
            theta -= mom
* clip_by_norm per tensor: g * clip/||g|| when ||g|| > clip.
"""

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp


def clip_grads_per_tensor(grads, clip_norm: float):
    """tf.clip_by_norm applied leaf-wise (sparse_graph_model.py:253-259)."""

    def clip(g):
        norm = jnp.sqrt(jnp.sum(jnp.square(g)))
        scale = jnp.minimum(1.0, clip_norm / (norm + 1e-20))
        return g * scale

    return jax.tree_util.tree_map(clip, grads)


class OptimizerState(NamedTuple):
    step: jnp.ndarray  # [] int32
    slots: Any  # optimizer-specific pytree (possibly empty)


class Optimizer:
    """A (init, update) pair; update takes the effective lr as a tracer."""

    def __init__(self, name: str, hparams: Dict[str, float]):
        name = name.lower()
        if name not in ("sgd", "adam", "rmsprop"):
            raise Exception('Unknown optimizer "%s".' % name)
        self.name = name
        self.hparams = hparams

    def init(self, params) -> OptimizerState:
        zeros_like = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)  # noqa: E731
        if self.name == "sgd":
            slots = ()
        elif self.name == "adam":
            slots = {"m": zeros_like(), "v": zeros_like()}
        else:  # rmsprop
            slots = {"ms": zeros_like(), "mom": zeros_like()}
        return OptimizerState(step=jnp.zeros((), jnp.int32), slots=slots)

    def update(self, grads, state: OptimizerState, params, lr):
        """Returns (new_params, new_state). lr may be a traced scalar."""
        tm = jax.tree_util.tree_map
        step = state.step + 1
        if self.name == "sgd":
            new_params = tm(lambda p, g: p - lr * g, params, grads)
            return new_params, OptimizerState(step, ())
        if self.name == "adam":
            b1, b2, eps = 0.9, 0.999, 1e-8
            m = tm(lambda m_, g: b1 * m_ + (1 - b1) * g, state.slots["m"], grads)
            v = tm(lambda v_, g: b2 * v_ + (1 - b2) * jnp.square(g), state.slots["v"], grads)
            t = step.astype(jnp.float32)
            lr_t = lr * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
            new_params = tm(
                lambda p, m_, v_: p - lr_t * m_ / (jnp.sqrt(v_) + eps), params, m, v
            )
            return new_params, OptimizerState(step, {"m": m, "v": v})
        # rmsprop
        decay = self.hparams.get("decay", 0.9)
        momentum = self.hparams.get("momentum", 0.0)
        eps = 1e-10
        ms = tm(
            lambda s, g: decay * s + (1 - decay) * jnp.square(g),
            state.slots["ms"], grads,
        )
        mom = tm(
            lambda mo, s, g: momentum * mo + lr * g / jnp.sqrt(s + eps),
            state.slots["mom"], ms, grads,
        )
        new_params = tm(lambda p, mo: p - mo, params, mom)
        return new_params, OptimizerState(step, {"ms": ms, "mom": mom})


def make_optimizer(model_params: Dict[str, Any]) -> Optimizer:
    """Build from the reference's hyperparameter names
    (sparse_graph_model.py:37-42)."""
    return Optimizer(
        model_params["optimizer"],
        {
            "decay": model_params.get("learning_rate_decay", 0.98),
            "momentum": model_params.get("momentum", 0.85),
        },
    )
