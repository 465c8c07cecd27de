"""On-device sampling: repeat penalty -> temperature -> top-k -> top-p.

Behavioral parity with `llama_sample_top_p_top_k`
(/root/reference/th-llama.cpp:802-907): temp<=0 is greedy argmax; the
CTRL-paper repetition penalty multiplies negative logits by the penalty
and divides positive ones; top-k keeps the k best; top-p keeps the
smallest prefix of the sorted distribution whose mass reaches top_p
(inclusive of the crossing token).

Unlike the reference — which copies logits to the host and samples on the
CPU every token (/root/reference/th-llama.cpp:719-726) — this runs as
jitted XLA on device, batched, inside the decode step, so token feedback
never leaves the chip.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from tokenhawk_tpu.config import SamplingConfig

_NEG_INF = jnp.float32(-1e30)


def apply_repeat_penalty(
    logits: jax.Array, last_tokens: jax.Array, penalty: float
) -> jax.Array:
    """CTRL repetition penalty over a ring buffer of recent tokens.

    logits: [B, V] f32.  last_tokens: [B, N] int32; entries < 0 are
    treated as empty slots.
    """
    if penalty == 1.0:
        return logits
    B, V = logits.shape
    valid = last_tokens >= 0
    idx = jnp.where(valid, last_tokens, 0)
    seen = jnp.zeros((B, V), dtype=bool)
    seen = seen.at[jnp.arange(B)[:, None], idx].max(valid)
    penalized = jnp.where(logits < 0, logits * penalty, logits / penalty)
    return jnp.where(seen, penalized, logits)


def top_k_mask(logits: jax.Array, k: int) -> jax.Array:
    """Set everything below the k-th best logit to -inf."""
    V = logits.shape[-1]
    if k <= 0 or k >= V:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, _NEG_INF, logits)


def top_p_mask(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus filter: keep the smallest prefix with mass >= p (inclusive)."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum_excl = jnp.cumsum(probs, axis=-1) - probs
    keep_sorted = cum_excl < p  # token that crosses p stays in
    # Threshold = smallest kept logit.
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < thresh, _NEG_INF, logits)


@partial(jax.jit, static_argnames=("cfg",))
def sample(
    logits: jax.Array,
    key: jax.Array,
    cfg: SamplingConfig,
    last_tokens: Optional[jax.Array] = None,
) -> jax.Array:
    """Sample next-token ids.  logits: [B, V] -> [B] int32."""
    logits = logits.astype(jnp.float32)
    if cfg.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if last_tokens is not None and cfg.repeat_penalty != 1.0:
        logits = apply_repeat_penalty(logits, last_tokens, cfg.repeat_penalty)
    logits = logits / cfg.temperature
    logits = top_k_mask(logits, cfg.top_k)
    logits = top_p_mask(logits, cfg.top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def greedy(logits: jax.Array) -> jax.Array:
    return jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
