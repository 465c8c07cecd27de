"""Pipeline-parallel path (parallel/pp.py) vs single-device reference.

Runs on the virtual 8-device CPU mesh (tests/conftest.py).  The model
in the reference has no multi-device layer at all; PP is SURVEY §2.6's
layer-stage axis for the multi-host 70B config.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.models.llama import KVCache, params_from_ggml
from tokenhawk_tpu.parallel.mesh import make_pp_mesh
from tokenhawk_tpu.parallel.pp import (
    make_pp_decode_fn,
    make_pp_prefill_fn,
    shard_cache_pp,
    shard_params_pp,
    validate_pp,
)
from tokenhawk_tpu.runtime.engine import Engine, make_decode_fn, make_prefill_fn
from tokenhawk_tpu.tokenizer import byte_fallback_vocab

import sys

sys.path.insert(0, "tests")
from helpers import make_ggml_weights

CFG = LlamaConfig.tiny(n_vocab=512, n_embd=128, n_head=4, n_layer=4,
                       n_ctx=64, n_ff=256)
GREEDY = SamplingConfig(temperature=0.0)


@pytest.fixture(scope="module")
def tensors():
    return make_ggml_weights(CFG, np.random.default_rng(29))


def _params(tensors):
    return params_from_ggml(CFG, tensors, dtype=jnp.float32)


def test_validate_pp_rejects_indivisible():
    with pytest.raises(ValueError):
        validate_pp(CFG, 3)  # 3 does not divide n_layer=4


def test_pp_prefill_matches_single_device(tensors):
    """GPipe prefill (B=4 -> 4 microbatches over 4 stages) produces the
    same logits and KV cache as the single-device prefill."""
    mesh = make_pp_mesh(dp=1, pp=4)
    params = _params(tensors)
    params_pp = shard_params_pp(CFG, _params(tensors), mesh)

    B, T = 4, 16
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(3, CFG.n_vocab, (B, T)), jnp.int32)
    lengths = jnp.asarray([16, 9, 12, 5], jnp.int32)
    offsets = jnp.zeros((B,), jnp.int32)

    ref_prefill = make_prefill_fn(CFG)
    cache_ref, logits_ref = ref_prefill(
        params, KVCache.create(CFG, B, 64, jnp.float32), tokens, lengths,
        offsets)

    pp_prefill = make_pp_prefill_fn(CFG, mesh, params_pp)
    cache_pp, logits_pp = pp_prefill(
        params_pp, shard_cache_pp(KVCache.create(CFG, B, 64, jnp.float32),
                                  mesh),
        tokens, lengths, offsets)

    np.testing.assert_allclose(np.asarray(logits_pp), np.asarray(logits_ref),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(cache_pp.k), np.asarray(cache_ref.k),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(cache_pp.v), np.asarray(cache_ref.v),
                               atol=2e-4, rtol=2e-4)


def test_pp_decode_matches_single_device(tensors):
    """Stage-serial decode produces the same greedy tokens and offsets."""
    mesh = make_pp_mesh(dp=1, pp=4)
    params = _params(tensors)
    params_pp = shard_params_pp(CFG, _params(tensors), mesh)

    B, T = 2, 8
    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(3, CFG.n_vocab, (B, T)), jnp.int32)
    lengths = jnp.asarray([8, 6], jnp.int32)
    offsets0 = jnp.zeros((B,), jnp.int32)

    def run(prefill, decode, params, cache):
        cache, logits = prefill(params, cache, tokens, lengths, offsets0)
        last = jnp.argmax(logits, -1).astype(jnp.int32)
        last_n = jnp.full((B, 4), -1, jnp.int32)
        done = jnp.zeros((B,), bool)
        key = jax.random.PRNGKey(0)
        cache, toks, off, last_n, done = decode(
            params, cache, last, lengths, last_n, done, key)
        return np.asarray(toks), np.asarray(off)

    toks_ref, off_ref = run(
        make_prefill_fn(CFG), make_decode_fn(CFG, GREEDY, 4),
        params, KVCache.create(CFG, B, 64, jnp.float32))
    toks_pp, off_pp = run(
        make_pp_prefill_fn(CFG, mesh, params_pp),
        make_pp_decode_fn(CFG, mesh, GREEDY, 4, params=params_pp),
        params_pp,
        shard_cache_pp(KVCache.create(CFG, B, 64, jnp.float32), mesh))

    assert toks_pp.tolist() == toks_ref.tolist()
    assert off_pp.tolist() == off_ref.tolist()


@pytest.mark.parametrize("pp", [2, 4])
def test_pp_engine_generation_matches(tensors, pp):
    """Engine(parallel='pp') generates the same greedy tokens as the
    single-device Engine, including the B=1 (single-microbatch) path."""
    mesh = make_pp_mesh(dp=1, pp=pp)
    params = _params(tensors)
    params_pp = shard_params_pp(CFG, _params(tensors), mesh)
    tok = byte_fallback_vocab()

    e_ref = Engine(CFG, params, tokenizer=tok, sampling=GREEDY,
                   cache_dtype=jnp.float32, decode_chunk=4)
    e_pp = Engine(CFG, params_pp, tokenizer=tok, sampling=GREEDY,
                  cache_dtype=jnp.float32, decode_chunk=4,
                  mesh=mesh, parallel="pp")
    want = e_ref.generate([1, 17, 33, 70], max_new_tokens=6).tokens
    got = e_pp.generate([1, 17, 33, 70], max_new_tokens=6).tokens
    assert got == want


def test_pp_gqa_generation_matches():
    """GQA shape class under PP."""
    cfg = LlamaConfig.tiny(n_vocab=512, n_embd=256, n_head=8, n_kv_head=2,
                           n_ctx=64, n_ff=512, n_layer=4)
    tensors = make_ggml_weights(cfg, np.random.default_rng(53))
    mesh = make_pp_mesh(dp=1, pp=4)
    params = params_from_ggml(cfg, tensors, dtype=jnp.float32)
    params_pp = shard_params_pp(
        cfg, params_from_ggml(cfg, tensors, dtype=jnp.float32), mesh)
    tok = byte_fallback_vocab()
    e_ref = Engine(cfg, params, tokenizer=tok, sampling=GREEDY,
                   cache_dtype=jnp.float32, decode_chunk=4)
    e_pp = Engine(cfg, params_pp, tokenizer=tok, sampling=GREEDY,
                  cache_dtype=jnp.float32, decode_chunk=4,
                  mesh=mesh, parallel="pp")
    want = e_ref.generate([1, 11, 22, 33], max_new_tokens=6).tokens
    got = e_pp.generate([1, 11, 22, 33], max_new_tokens=6).tokens
    assert got == want
