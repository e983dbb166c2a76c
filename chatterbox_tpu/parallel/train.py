"""Sharded T3 training step (dp × tp) — the multi-chip validation path.

The reference ships dormant training methods (T3.loss, ref: t3.py:189-223;
flow compute_loss, ref: flow.py:86-129) but no distributed execution. Here
the T3 loss is wired to an optax AdamW update and jitted over a
(data, model) mesh: batch sharded over "data", attention/MLP weights over
"model" (parallel/mesh.py rules); XLA inserts the psums.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.t3.config import T3Config
from ..models.t3 import model as t3m
from .mesh import shard_t3_params


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState


def make_optimizer(lr: float = 1e-4, *, warmup_steps: int = 0,
                   total_steps: int = 0, weight_decay: float = 0.01,
                   clip_norm: float = 0.0):
    """AdamW, optionally with linear-warmup + cosine-decay schedule and
    global-norm gradient clipping (the production-training shape; the
    reference ships only the loss — ref: t3.py:189-223)."""
    if warmup_steps or total_steps:
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr,
            warmup_steps=max(warmup_steps, 1),
            decay_steps=max(total_steps, warmup_steps + 1))
    else:
        schedule = lr
    tx = optax.adamw(schedule, weight_decay=weight_decay)
    if clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx


def t3_train_step(state: TrainState, hp: T3Config, optimizer,
                  cond: t3m.T3CondArrays,
                  text_tokens: jnp.ndarray, text_lens: jnp.ndarray,
                  speech_tokens: jnp.ndarray, speech_lens: jnp.ndarray):
    """One AdamW step on loss_text + loss_speech (ref loss: t3.py:189-223)."""

    def loss_fn(params):
        # layer-wise remat: activation memory ~O(1 layer) during backward
        lt, ls = t3m.t3_loss(params, hp, cond, text_tokens, text_lens,
                             speech_tokens, speech_lens, remat=True)
        return lt + ls, (lt, ls)

    grads, (lt, ls) = jax.grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state), {"loss_text": lt, "loss_speech": ls}


def flow_train_step(state: TrainState, optimizer, key,
                    token, token_len, feat, feat_len, embedding,
                    dims, remat: bool = True):
    """One AdamW step on the masked CFM loss (ref dormant method:
    flow.py:86-129 + flow_matching.py:147-193)."""
    from ..models.s3gen.flow import flow_compute_loss

    def loss_fn(params):
        return flow_compute_loss(
            params, key, token=token, token_len=token_len, feat=feat,
            feat_len=feat_len, embedding=embedding, dims=dims, remat=remat)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state), {"loss_cfm": loss}


def build_sharded_flow_train_step(dims, mesh, lr: float = 1e-4,
                                  remat: bool = True, **opt_kw):
    """Flow (S3Gen token→mel) fine-tuning over the data axis: params
    replicated (the flow stack is ~1/4 the T3's size — dp is the right
    parallelism), batch sharded over "data". Returns (jitted step,
    initial-state factory)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..models.s3gen.flow import flow_init

    optimizer = make_optimizer(lr, **opt_kw)
    repl = NamedSharding(mesh, P())
    batch_sharding = NamedSharding(mesh, P("data"))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, key, token, token_len, feat, feat_len, embedding):
        token = jax.lax.with_sharding_constraint(token, batch_sharding)
        feat = jax.lax.with_sharding_constraint(feat, batch_sharding)
        return flow_train_step(state, optimizer, key, token, token_len,
                               feat, feat_len, embedding, dims, remat=remat)

    def init_state(key, meanflow: bool = False):
        params = flow_init(key, meanflow=meanflow, dims=dims)
        params = jax.device_put(params, repl)
        opt_state = optimizer.init(params)
        return TrainState(params, opt_state)

    return step, init_state


def build_sharded_train_step(hp: T3Config, mesh, lr: float = 1e-4, **opt_kw):
    """Returns (jitted step, initial sharded TrainState factory)."""
    optimizer = make_optimizer(lr, **opt_kw)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, cond, text_tokens, text_lens, speech_tokens, speech_lens):
        return t3_train_step(state, hp, optimizer, cond, text_tokens,
                             text_lens, speech_tokens, speech_lens)

    def init_state(key):
        params = t3m.t3_init(key, hp)
        params = shard_t3_params(params, mesh)
        opt_state = optimizer.init(params)
        return TrainState(params, opt_state)

    return step, init_state
