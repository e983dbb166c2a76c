"""On-device logits processors + categorical sampling.

The reference drives sampling through HF logits processors on the host every
step (ref: models/t3/t3.py:319-360, 396-455). On TPU that per-step host
round-trip is the latency killer, so these are pure jnp functions designed to
live inside a `lax.while_loop`:

  * repetition penalty over the generated history is O(V) via a persistent
    "seen token" buffer updated by one scatter per step — reference semantics
    are "penalize any token that has appeared" (RepetitionPenaltyLogitsProcessor);
  * top-k / top-p / min-p are sort/threshold ops over the (small) speech vocab;
  * the sample itself is `jax.random.categorical` on the filtered logits.

Two processor orderings exist in the reference and both are preserved:
  * CFG path:   rep_penalty → temperature → min_p → top_p   (t3.py:341-360)
  * Turbo path: temperature → top_k → top_p → rep_penalty   (t3.py:396-404)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.finfo(jnp.float32).min


def apply_repetition_penalty(logits: jnp.ndarray, seen: jnp.ndarray,
                             penalty) -> jnp.ndarray:
    """HF RepetitionPenaltyLogitsProcessor semantics: for every token in the
    history, score>0 → score/penalty, else score*penalty.

    logits: (..., V); seen: bool (..., V)."""
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def apply_temperature(logits: jnp.ndarray, temperature) -> jnp.ndarray:
    return logits / temperature


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the k highest logits (k static)."""
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, top_p) -> jnp.ndarray:
    """HF TopPLogitsWarper: keep the smallest prefix of the descending-prob
    sort whose cumulative probability first reaches top_p (top token always
    kept). top_p >= 1.0 keeps EVERYTHING — HF skips the warper entirely
    there (ref: t3.py:398-401), and the cumulative formula alone does not
    reduce to keep-all: once `cum` saturates to exactly 1.0 in f32 (peaked
    distributions), `cum - probs < 1.0` starts dropping the tail. Caught by
    the free-running turbo A/B (tests/test_convert.py)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # token kept if the cumulative mass *before* it is < top_p
    keep_sorted = ((cum - probs) < top_p) | (top_p >= 1.0)
    # threshold = smallest kept logit
    threshold = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits < threshold, NEG_INF, logits)


def apply_min_p(logits: jnp.ndarray, min_p) -> jnp.ndarray:
    """HF MinPLogitsWarper: drop tokens with prob < min_p * max_prob."""
    probs = jax.nn.softmax(logits, axis=-1)
    top = jnp.max(probs, axis=-1, keepdims=True)
    return jnp.where(probs < min_p * top, NEG_INF, logits)


def cfg_combine(cond: jnp.ndarray, uncond: jnp.ndarray, w) -> jnp.ndarray:
    """Classifier-free guidance combine (ref: t3.py:341-344)."""
    return cond + w * (cond - uncond)


def sample_categorical(key, logits: jnp.ndarray) -> jnp.ndarray:
    """Multinomial over softmax(logits). -inf entries have zero probability."""
    return jax.random.categorical(key, logits, axis=-1)


class SamplerParams(NamedTuple):
    """Dynamic (traced) sampling controls."""
    temperature: jnp.ndarray
    top_p: jnp.ndarray
    min_p: jnp.ndarray
    repetition_penalty: jnp.ndarray
    cfg_weight: jnp.ndarray

    @classmethod
    def make(cls, temperature=0.8, top_p=0.95, min_p=0.05,
             repetition_penalty=1.2, cfg_weight=0.5):
        f = lambda v: jnp.asarray(v, jnp.float32)
        return cls(f(temperature), f(top_p), f(min_p), f(repetition_penalty),
                   f(cfg_weight))


def process_logits_cfg(logits_cond, logits_uncond, seen, sp: SamplerParams):
    """The 520M CFG pipeline (ref: t3.py:338-360):
    cfg-combine → repetition penalty → temperature → min_p → top_p."""
    logits = cfg_combine(logits_cond, logits_uncond, sp.cfg_weight)
    logits = apply_repetition_penalty(logits, seen, sp.repetition_penalty)
    logits = apply_temperature(logits, sp.temperature)
    logits = apply_min_p(logits, sp.min_p)
    logits = apply_top_p(logits, sp.top_p)
    return logits


def process_logits_turbo(logits, seen, sp: SamplerParams, top_k: int):
    """The Turbo pipeline (ref: t3.py:396-404):
    temperature → top_k → top_p → repetition penalty.
    (HF warpers skip when at neutral settings: temp==1, top_p>=1, pen==1.
    The formulas below are identity at those values too — top_p>=1 needs
    the explicit keep-all bypass below, see apply_top_p.)

    Implemented with ONE descending sort: sequential top_k-then-top_p keeps
    exactly {l >= max(kth_value, top_p_threshold)} where the top_p cumulative
    mass is taken over the top_k-masked softmax — both cutoffs fall out of
    the same sorted array. Equivalence to the op-by-op chain is tested
    (tests/test_sampling.py)."""
    V = logits.shape[-1]
    l = apply_temperature(logits, sp.temperature)
    sorted_l = jnp.sort(l, axis=-1)[..., ::-1]
    ranks = jnp.arange(V)
    if 0 < top_k < V:
        masked = jnp.where(ranks < top_k, sorted_l, NEG_INF)
    else:
        masked = sorted_l
    probs = jax.nn.softmax(masked, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = ((cum - probs) < sp.top_p) | (sp.top_p >= 1.0)
    if 0 < top_k < V:
        keep = keep & (ranks < top_k)
    threshold = jnp.min(jnp.where(keep, sorted_l, jnp.inf), axis=-1, keepdims=True)
    l = jnp.where(l < threshold, NEG_INF, l)
    return apply_repetition_penalty(l, seen, sp.repetition_penalty)


def process_logits_turbo_unfused(logits, seen, sp: SamplerParams, top_k: int):
    """Op-by-op reference for the fused pipeline above (test oracle)."""
    logits = apply_temperature(logits, sp.temperature)
    logits = apply_top_k(logits, top_k)
    logits = apply_top_p(logits, sp.top_p)
    logits = apply_repetition_penalty(logits, seen, sp.repetition_penalty)
    return logits
