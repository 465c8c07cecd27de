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


def normalize_eos(eos_id):
    """An eos spec (int, or an iterable for multi-EOS vocabs — Llama-3
    instruct stops on <|end_of_text|> AND <|eot_id|>) -> (sentinel,
    sorted tuple).  The sentinel (primary EOS) is what frozen slots
    emit; the tuple is what the traced done-latch tests against."""
    if isinstance(eos_id, (tuple, list, set, frozenset)):
        ids = tuple(sorted(int(e) for e in eos_id))
        if not ids:
            raise ValueError("empty eos id set")
        return ids[0], ids
    return int(eos_id), (int(eos_id),)


def is_eos(tok: jax.Array, eos_ids) -> jax.Array:
    """Elementwise membership in a STATIC tuple of end-of-generation ids
    (unrolled compare-or chain: the set is tiny and baked into the
    compiled step)."""
    m = tok == eos_ids[0]
    for e in eos_ids[1:]:
        m = m | (tok == e)
    return m


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


# ---------------------------------------------------------------------------
# Per-request (traced) sampling — continuous batching serves concurrent
# requests with DIFFERENT sampling settings through one jitted decode
# step, so the parameters must be device arrays, not compile-time
# constants.  (The reference hardcodes one setting at its call sites,
# /root/reference/th-llama.cpp:719-722.)
# ---------------------------------------------------------------------------

import dataclasses


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SamplingParams:
    """Per-slot sampling parameters as [B] device arrays.

    temperature <= 0 means greedy; top_k <= 0 disables top-k; top_p >= 1
    disables nucleus filtering; repeat_penalty == 1 disables the CTRL
    penalty.  `seed` drives a per-slot counter-based RNG so each request
    is reproducible independently of its batch neighbours.
    """

    temperature: jax.Array  # [B] f32
    top_k: jax.Array  # [B] i32
    top_p: jax.Array  # [B] f32
    repeat_penalty: jax.Array  # [B] f32
    seed: jax.Array  # [B] i32

    @staticmethod
    def broadcast(cfg: SamplingConfig, batch: int) -> "SamplingParams":
        t = 0.0 if cfg.greedy else cfg.temperature
        return SamplingParams(
            temperature=jnp.full((batch,), t, jnp.float32),
            top_k=jnp.full((batch,), cfg.top_k, jnp.int32),
            top_p=jnp.full((batch,), cfg.top_p, jnp.float32),
            repeat_penalty=jnp.full((batch,), cfg.repeat_penalty, jnp.float32),
            seed=jnp.full((batch,), cfg.seed, jnp.int32),
        )

    @staticmethod
    def slot_values(cfg: SamplingConfig):
        """Host-side scalar tuple for one slot (see Scheduler._admit_one)."""
        t = 0.0 if cfg.greedy else cfg.temperature
        return (t, cfg.top_k, cfg.top_p, cfg.repeat_penalty, cfg.seed)

    @staticmethod
    def from_configs(cfgs, pad_to: int) -> "SamplingParams":
        """Padded per-row params for a batched admission group (both
        schedulers): rows beyond len(cfgs) repeat the last config — they
        correspond to padding rows whose state scatter drops."""
        vals = [SamplingParams.slot_values(c) for c in cfgs]
        vals += [vals[-1]] * (pad_to - len(vals))
        t, k, p, r, s = zip(*vals)
        return SamplingParams(
            temperature=jnp.asarray(t, jnp.float32),
            top_k=jnp.asarray(k, jnp.int32),
            top_p=jnp.asarray(p, jnp.float32),
            repeat_penalty=jnp.asarray(r, jnp.float32),
            seed=jnp.asarray(s, jnp.int32),
        )

    def set_slot(self, slot, values) -> "SamplingParams":
        t, k, p, r, s = values
        return SamplingParams(
            temperature=self.temperature.at[slot].set(t),
            top_k=self.top_k.at[slot].set(k),
            top_p=self.top_p.at[slot].set(p),
            repeat_penalty=self.repeat_penalty.at[slot].set(r),
            seed=self.seed.at[slot].set(s),
        )


def _per_slot_categorical(z, seeds, counters):
    """Sample each row with its own (seed, counter) stream."""

    def one(zi, s, c):
        k = jax.random.fold_in(jax.random.PRNGKey(s), c)
        return jax.random.categorical(k, zi)

    return jax.vmap(one)(z, seeds, counters).astype(jnp.int32)


def processed_probs_dynamic(
    logits: jax.Array,  # [B, V]
    sp: "SamplingParams",
    last_tokens: Optional[jax.Array] = None,  # [B, N]
) -> jax.Array:
    """Per-slot PROCESSED next-token distribution: [B, V] probabilities.

    The exact distribution `sample_dynamic` draws from — repetition
    penalty (over `last_tokens`), temperature, top-k and top-p applied;
    greedy slots (temperature <= 0) return an exact one-hot at the RAW
    argmax (the reference short-circuits before the penalty).
    Speculative decoding's rejection rule needs these full distributions
    for both draft and target so accepted outputs are distributed
    exactly as target-only sampling (the standard accept/residual
    theorem applies position-wise to the PROCESSED distributions).
    """
    logits = logits.astype(jnp.float32)
    B, V = logits.shape
    one_hot = jax.nn.one_hot(jnp.argmax(logits, axis=-1), V,
                             dtype=jnp.float32)
    if last_tokens is not None:
        valid = last_tokens >= 0
        idx = jnp.where(valid, last_tokens, 0)
        seen = jnp.zeros((B, V), dtype=bool)
        seen = seen.at[jnp.arange(B)[:, None], idx].max(valid)
        pen = sp.repeat_penalty[:, None]
        penalized = jnp.where(logits < 0, logits * pen, logits / pen)
        logits = jnp.where(seen, penalized, logits)
    z = logits / jnp.maximum(sp.temperature, 1e-6)[:, None]
    sorted_z = jnp.sort(z, axis=-1)[:, ::-1]
    rank = jnp.arange(V)[None, :]
    k = jnp.where(sp.top_k <= 0, V, sp.top_k)[:, None]
    z_k = jnp.where(rank < k, sorted_z, _NEG_INF)
    probs_sorted = jax.nn.softmax(z_k, axis=-1)
    cum_excl = jnp.cumsum(probs_sorted, axis=-1) - probs_sorted
    kept = (rank < k) & (cum_excl < sp.top_p[:, None])
    thresh = jnp.min(jnp.where(kept, sorted_z, jnp.inf), axis=-1,
                     keepdims=True)
    z = jnp.where(z < thresh, _NEG_INF, z)
    probs = jax.nn.softmax(z, axis=-1)
    return jnp.where(sp.temperature[:, None] <= 0.0, one_hot, probs)


def categorical_probs(probs: jax.Array, seeds: jax.Array,
                      counters: jax.Array) -> jax.Array:
    """Per-slot categorical draw from probability rows [B, V] -> [B].

    Zero-probability tokens map to -inf logits (not a tiny clamp), so
    tokens masked out by top-k/top-p are exactly unreachable — matching
    sample_dynamic's hard mask and the processed distribution the
    speculative rejection-sampling theorem assumes."""
    z = jnp.where(probs > 0, jnp.log(jnp.maximum(probs, 1e-30)), _NEG_INF)
    return _per_slot_categorical(z, seeds, counters)


def uniform_rows(seeds: jax.Array, counters: jax.Array, n: int) -> jax.Array:
    """Per-slot U(0,1) rows: [B] seeds/counters -> [B, n]."""

    def one(s, c):
        k = jax.random.fold_in(jax.random.PRNGKey(s), c)
        return jax.random.uniform(k, (n,))

    return jax.vmap(one)(seeds, counters)


def sample_dynamic(
    logits: jax.Array,  # [B, V]
    sp: SamplingParams,
    counters: jax.Array,  # [B] i32 per-slot step counters
    last_tokens: Optional[jax.Array] = None,  # [B, N]
) -> jax.Array:
    """Per-slot traced sampling: [B, V] -> [B] int32.

    One sort serves both the traced top-k (rank mask) and top-p
    (cumulative-mass mask); slots with temperature <= 0 take the argmax.
    """
    logits = logits.astype(jnp.float32)
    B, V = logits.shape

    # Greedy slots take the raw argmax: the reference short-circuits
    # BEFORE the repeat penalty (/root/reference/th-llama.cpp:826-838).
    greedy_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    if last_tokens is not None:
        valid = last_tokens >= 0
        idx = jnp.where(valid, last_tokens, 0)
        seen = jnp.zeros((B, V), dtype=bool)
        seen = seen.at[jnp.arange(B)[:, None], idx].max(valid)
        pen = sp.repeat_penalty[:, None]
        penalized = jnp.where(logits < 0, logits * pen, logits / pen)
        logits = jnp.where(seen, penalized, logits)

    z = logits / jnp.maximum(sp.temperature, 1e-6)[:, None]
    sorted_z = jnp.sort(z, axis=-1)[:, ::-1]
    rank = jnp.arange(V)[None, :]
    k = jnp.where(sp.top_k <= 0, V, sp.top_k)[:, None]
    z_k = jnp.where(rank < k, sorted_z, _NEG_INF)
    probs = jax.nn.softmax(z_k, axis=-1)
    cum_excl = jnp.cumsum(probs, axis=-1) - probs
    kept = (rank < k) & (cum_excl < sp.top_p[:, None])
    thresh = jnp.min(jnp.where(kept, sorted_z, jnp.inf), axis=-1, keepdims=True)
    z = jnp.where(z < thresh, _NEG_INF, z)

    sampled = _per_slot_categorical(z, sp.seed, counters)
    return jnp.where(sp.temperature <= 0.0, greedy_ids, sampled)
