"""Sharded training step: Adam(0.8, 0.95) + 1/(1+decay*step) LR schedule.

Matches the reference's optimizer hyperparameters and per-step LambdaLR
decay (reference: train.py:95-97,149-155) with optax, jitted over a device
mesh: batch rows (utterance x channel-realisation) sharded on the "dp"
axis, parameters replicated, gradients psum-reduced by XLA from the
sharded loss mean.  Per-sequence channel draws stay independent because
the PRNG key is folded per batch row (preserving the reference's contract
of independent per-sequence EbNo/phase/freq draws, radae.py:470-473).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.core import distortion_loss

ADAM_BETAS = (0.8, 0.95)
ADAM_EPS = 1e-8


@partial(jax.tree_util.register_dataclass,
         data_fields=["params", "opt_state", "step"], meta_fields=[])
@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float, lr_decay_factor: float):
    """Adam with the reference's betas and inverse-linear LR decay."""
    schedule = lambda step: lr / (1.0 + lr_decay_factor * step)
    return optax.chain(
        optax.scale_by_adam(b1=ADAM_BETAS[0], b2=ADAM_BETAS[1], eps=ADAM_EPS),
        optax.scale_by_learning_rate(schedule),
    )


def make_train_step(model, lr: float = 3e-4, lr_decay_factor: float = 2.5e-5,
                    mesh=None, aux_ber: bool = False,
                    aux_weight_boost: float = 1.0, remat: bool = False,
                    scan_steps: int = 1):
    """Build (init_state, train_step).

    train_step(state, features, H, G, key) -> (state, metrics)
    where metrics = {"loss": (1,), ["ber": (1,)]}.

    With a mesh, inputs are expected batch-sharded on axis "dp" and params
    replicated; without, it is a plain single-device jit.

    remat=True rematerialises the forward during the backward pass
    (jax.checkpoint): ~+1 forward of FLOPs for ~no stored residuals,
    raising the max batch per chip — worth it when the step is
    HBM-capacity-bound, not when it is recurrence-latency-bound.

    scan_steps>1 runs that many optimizer steps per call inside one
    lax.scan, amortising per-call dispatch latency on relay-tunnelled
    devices (measured ~100 ms/call — 30x the B=32 device step time).
    Pass features (and H/G, when given) with an extra leading scan axis
    (scan_steps, B, T, F) to give every step its own minibatch; a plain
    (B, T, F) batch is reused for all steps (timing/fine-tune mode).
    Channel/quant noise differ per step either way because the key is
    folded with the incrementing state.step.  Metrics are the last
    step's.
    """
    opt = make_optimizer(lr, lr_decay_factor)
    forward = jax.checkpoint(model.forward) if remat else model.forward

    def init_state(params) -> TrainState:
        return TrainState(params=params, opt_state=opt.init(params),
                          step=jnp.zeros((), jnp.int32))

    def loss_fn(params, features, H, G, key):
        out = forward(params, features, H, G, key=key)
        loss = distortion_loss(features, out["features_hat"]).mean()
        aux = None
        if aux_ber:
            x = features[..., 20] * out["features_hat"][..., 20]
            aux = (x < 0).mean()
            if aux_weight_boost != 1.0:
                # optional training-time emphasis of the aux data channel
                # (the published loss keeps the reference's 0.5/18 weight;
                # the boost only adds extra gradient pressure)
                extra = (features[..., 20] - out["features_hat"][..., 20]) ** 2
                loss = loss + (aux_weight_boost - 1.0) * (0.5 / 18.0) * extra.mean()
        return loss, aux

    def train_step(state: TrainState, features, H, G, key):
        # fold the step into the key so every step draws fresh channels
        key = jax.random.fold_in(key, state.step)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, features, H, G, key)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss.reshape(1)}
        if aux_ber:
            metrics["ber"] = aux.reshape(1)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), metrics

    if scan_steps > 1:
        inner_step = train_step

        def train_step(state: TrainState, features, H, G, key):
            if features.ndim == 4:          # (scan, B, T, F): per-step data
                assert features.shape[0] == scan_steps, features.shape
                # H/G must be stacked the same way: otherwise lax.scan
                # would silently slice them along the batch axis whenever
                # B happens to equal scan_steps
                for name, arr in (("H", H), ("G", G)):
                    if arr is not None:
                        assert arr.shape[0] == scan_steps, (name, arr.shape)

                def body(st, xs):
                    st2, m = inner_step(st, xs[0], xs[1], xs[2], key)
                    return st2, m

                state, metrics = jax.lax.scan(body, state, (features, H, G))
            else:                           # same batch every step

                def body(st, _):
                    st2, m = inner_step(st, features, H, G, key)
                    return st2, m

                state, metrics = jax.lax.scan(body, state, None,
                                              length=scan_steps)
            return state, jax.tree_util.tree_map(lambda x: x[-1], metrics)

    # batch inputs arrive already placed with a NamedSharding (via
    # parallel.mesh.shard_batch); jit propagates those input shardings, so
    # no explicit in_shardings needed (and H/G may be None for in-graph
    # benign channels).  The state is donated: params + Adam moments
    # (~3x params) update in place instead of allocating fresh buffers
    # every step (callers always rebind `state` to the returned one).
    train_step = jax.jit(train_step, donate_argnums=(0,))
    return init_state, train_step


def make_eval_step(model, mesh=None, aux_ber: bool = False):
    """Forward-only step returning per-sequence loss (for loss-vs-EqNo
    collection, reference train.py:161-226)."""

    def eval_step(params, features, H, G, key):
        out = model.forward(params, features, H, G, key=key)
        loss = distortion_loss(features[..., :20], out["features_hat"][..., :20])
        return loss, out["EbNodB"].reshape(-1), out["sigma"].reshape(features.shape[0], -1)

    if mesh is not None:
        data = NamedSharding(mesh, P("dp"))
        return jax.jit(eval_step, in_shardings=(None, data, data, data, None))
    return jax.jit(eval_step)
