"""Speculative decoding (runtime/speculative.py).

The defining property of greedy speculative decoding: output is
BIT-IDENTICAL to target-only greedy decoding for ANY draft model — the
draft changes throughput, never content.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.models.llama import params_from_ggml
from tokenhawk_tpu.runtime.engine import Engine
from tokenhawk_tpu.runtime.speculative import SpeculativeEngine

import sys

sys.path.insert(0, "tests")
from helpers import make_ggml_weights

CFG_T = LlamaConfig.tiny(n_vocab=512, n_embd=128, n_head=4, n_layer=4,
                         n_ctx=64, n_ff=256)
CFG_D = LlamaConfig.tiny(n_vocab=512, n_embd=64, n_head=2, n_layer=2,
                         n_ctx=64, n_ff=128)
GREEDY = SamplingConfig(temperature=0.0)


@pytest.fixture(scope="module")
def target_params():
    return params_from_ggml(CFG_T, make_ggml_weights(
        CFG_T, np.random.default_rng(11)), dtype=jnp.float32)


def _want(target_params, prompt, n):
    e = Engine(CFG_T, target_params, sampling=GREEDY,
               cache_dtype=jnp.float32, decode_chunk=4)
    return e.generate(prompt, max_new_tokens=n).tokens


@pytest.mark.parametrize("gamma", [1, 3, 4])
def test_spec_matches_target_greedy_any_draft(target_params, gamma):
    """A RANDOM unrelated draft must still produce the target's exact
    greedy stream (possibly with zero accepted drafts)."""
    draft_params = params_from_ggml(CFG_D, make_ggml_weights(
        CFG_D, np.random.default_rng(99)), dtype=jnp.float32)
    spec = SpeculativeEngine(CFG_T, target_params, CFG_D, draft_params,
                             gamma=gamma, cache_dtype=jnp.float32)
    prompt = [1, 7, 42, 9]
    want = _want(target_params, prompt, 12)
    got, stats = spec.generate(prompt, max_new_tokens=12)
    assert got == want
    assert stats["rounds"] > 0


def test_spec_self_draft_accepts_drafts(target_params):
    """Draft == target: drafts should frequently match the verify pass.

    Not exactly 1.0 even for identical weights: the draft runs the T=1
    decode path and the verifier a T=gamma+1 forward — different
    reduction orders, ~1e-2 logit deltas — and RANDOM weights produce
    near-tie logits that flip argmax.  Real models have O(1) logit gaps
    where self-acceptance is ~1; here we assert speculation engages and
    the output stays exact (the property that actually matters)."""
    spec = SpeculativeEngine(CFG_T, target_params, CFG_T, target_params,
                             gamma=3, cache_dtype=jnp.float32)
    prompt = [1, 5, 9]
    want = _want(target_params, prompt, 12)
    got, stats = spec.generate(prompt, max_new_tokens=12)
    assert got == want
    assert stats["acceptance_rate"] > 0.0
    assert stats["tokens_per_round"] > 1.0


def test_spec_streams_tokens(target_params):
    seen = []
    draft_params = params_from_ggml(CFG_D, make_ggml_weights(
        CFG_D, np.random.default_rng(3)), dtype=jnp.float32)
    spec = SpeculativeEngine(CFG_T, target_params, CFG_D, draft_params,
                             gamma=2, cache_dtype=jnp.float32)
    got, _ = spec.generate([1, 17], max_new_tokens=8, on_token=seen.append)
    assert seen == got


def test_spec_vocab_mismatch_rejected(target_params):
    cfg_bad = LlamaConfig.tiny(n_vocab=256, n_embd=64, n_head=2, n_layer=2,
                               n_ctx=64, n_ff=128)
    bad = params_from_ggml(cfg_bad, make_ggml_weights(
        cfg_bad, np.random.default_rng(1)), dtype=jnp.float32)
    with pytest.raises(ValueError):
        SpeculativeEngine(CFG_T, target_params, cfg_bad, bad)
