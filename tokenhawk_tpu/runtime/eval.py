"""Perplexity / log-likelihood evaluation.

BASELINE.json gates quantized correctness on perplexity: f16 must match
the reference model and Q8_0/Q4_0 must stay within llama.cpp's stated
deltas at the same bit-width.  The reference has no evaluation tooling at
all (correctness was eyeballed; SURVEY.md §4) — this module supplies it.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tokenhawk_tpu.config import LlamaConfig
from tokenhawk_tpu.models.llama import KVCache, LlamaParams, forward, logits_from_hidden


def make_score_fn(cfg: LlamaConfig, seq_len: int):
    """jit fn: (params, tokens [B,T]) -> next-token logprobs [B, T-1].

    logprobs[b, t] = log P(tokens[b, t+1] | tokens[b, <=t]).
    """

    @jax.jit
    def score(params: LlamaParams, tokens: jax.Array) -> jax.Array:
        B, T = tokens.shape
        cache = KVCache.create(cfg, B, T, jnp.bfloat16)
        h, _ = forward(cfg, params, tokens, cache, jnp.zeros((B,), jnp.int32))
        logits = logits_from_hidden(cfg, params, h)  # [B, T, V] f32
        logp = jax.nn.log_softmax(logits, axis=-1)
        nxt = tokens[:, 1:]  # targets
        return jnp.take_along_axis(logp[:, :-1], nxt[..., None], axis=-1)[..., 0]

    return score


def perplexity(
    cfg: LlamaConfig,
    params: LlamaParams,
    tokens: Sequence[int],
    window: int = 512,
) -> float:
    """Sliding non-overlapping window perplexity over a token stream
    (llama.cpp-style chunked evaluation: each window is scored from an
    empty context, first token of each window unscored)."""
    toks = np.asarray(tokens, np.int32)
    n_win = len(toks) // window
    if n_win == 0:
        raise ValueError(f"need at least {window} tokens, got {len(toks)}")
    score = make_score_fn(cfg, window)
    total = 0.0
    count = 0
    for i in range(n_win):
        chunk = toks[i * window : (i + 1) * window][None, :]
        lp = np.asarray(score(params, jnp.asarray(chunk)))
        total += float(lp.sum())
        count += lp.shape[1]
    return float(np.exp(-total / count))


def mean_nll(
    cfg: LlamaConfig, params: LlamaParams, tokens: Sequence[int], window: int = 512
) -> float:
    return float(np.log(perplexity(cfg, params, tokens, window)))
