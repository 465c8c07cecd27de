import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig
from tokenhawk_tpu.models.llama import (
    KVCache,
    forward,
    init_params,
    logits_from_hidden,
    params_from_ggml,
)
from tokenhawk_tpu.models.reference_numpy import forward_np

from helpers import make_ggml_weights

CFG = LlamaConfig.tiny()


def _params(rng, cfg=CFG, dtype=jnp.float32):
    tensors = make_ggml_weights(cfg, rng)
    return tensors, params_from_ggml(cfg, tensors, dtype=dtype)


def test_forward_matches_numpy_oracle(rng):
    tensors, params = _params(rng)
    tokens = rng.integers(0, CFG.n_vocab, size=(7,))
    cache = KVCache.create(CFG, batch=1, max_seq=16, dtype=jnp.float32)
    h, _ = forward(CFG, params, jnp.asarray(tokens[None, :], jnp.int32), cache,
                   jnp.zeros((1,), jnp.int32))
    got = np.asarray(logits_from_hidden(CFG, params, h))[0]
    want = forward_np(CFG, tensors, tokens)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_gqa_forward_matches_numpy_oracle(rng):
    cfg = LlamaConfig.tiny(n_kv_head=2)
    tensors = make_ggml_weights(cfg, rng)
    params = params_from_ggml(cfg, tensors, dtype=jnp.float32)
    tokens = rng.integers(0, cfg.n_vocab, size=(5,))
    cache = KVCache.create(cfg, batch=1, max_seq=8, dtype=jnp.float32)
    h, _ = forward(cfg, params, jnp.asarray(tokens[None, :], jnp.int32), cache,
                   jnp.zeros((1,), jnp.int32))
    got = np.asarray(logits_from_hidden(cfg, params, h))[0]
    want = forward_np(cfg, tensors, tokens)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_half_rope_style_matches_oracle(rng):
    cfg = LlamaConfig.tiny(rope_style="half")
    tensors = make_ggml_weights(cfg, rng)
    params = params_from_ggml(cfg, tensors, dtype=jnp.float32)
    tokens = rng.integers(0, cfg.n_vocab, size=(5,))
    cache = KVCache.create(cfg, batch=1, max_seq=8, dtype=jnp.float32)
    h, _ = forward(cfg, params, jnp.asarray(tokens[None, :], jnp.int32), cache,
                   jnp.zeros((1,), jnp.int32))
    got = np.asarray(logits_from_hidden(cfg, params, h))[0]
    want = forward_np(cfg, tensors, tokens)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_decode_matches_prefill(rng):
    """Token-by-token decode equals one-shot prefill (KV-cache correctness)."""
    _, params = _params(rng)
    T = 6
    tokens = jnp.asarray(rng.integers(0, CFG.n_vocab, size=(1, T)), jnp.int32)

    cache = KVCache.create(CFG, batch=1, max_seq=16, dtype=jnp.float32)
    h_all, _ = forward(CFG, params, tokens, cache, jnp.zeros((1,), jnp.int32))
    want = np.asarray(logits_from_hidden(CFG, params, h_all))[0]  # [T, V]

    cache = KVCache.create(CFG, batch=1, max_seq=16, dtype=jnp.float32)
    got = []
    for t in range(T):
        h, cache = forward(
            CFG, params, tokens[:, t : t + 1], cache,
            jnp.full((1,), t, jnp.int32),
        )
        got.append(np.asarray(logits_from_hidden(CFG, params, h))[0, 0])
    np.testing.assert_allclose(np.stack(got), want, atol=2e-4, rtol=1e-4)


def test_prefill_then_decode_continues(rng):
    """Prefill a prompt then decode one token == full-sequence forward."""
    _, params = _params(rng)
    T = 8
    tokens = jnp.asarray(rng.integers(0, CFG.n_vocab, size=(1, T)), jnp.int32)

    cache = KVCache.create(CFG, batch=1, max_seq=16, dtype=jnp.float32)
    h_all, _ = forward(CFG, params, tokens, cache, jnp.zeros((1,), jnp.int32))
    want = np.asarray(logits_from_hidden(CFG, params, h_all))[0, -1]

    cache = KVCache.create(CFG, batch=1, max_seq=16, dtype=jnp.float32)
    _, cache = forward(CFG, params, tokens[:, :-1], cache, jnp.zeros((1,), jnp.int32))
    h, _ = forward(CFG, params, tokens[:, -1:], cache, jnp.full((1,), T - 1, jnp.int32))
    got = np.asarray(logits_from_hidden(CFG, params, h))[0, 0]
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_batched_ragged_offsets(rng):
    """Two sequences at different cache offsets decode independently."""
    _, params = _params(rng)
    toks = rng.integers(0, CFG.n_vocab, size=(2, 10))

    # Sequence 0 has 4 tokens of history, sequence 1 has 7.
    lens = [4, 7]
    caches = []
    per_seq_logits = []
    for b in range(2):
        cache = KVCache.create(CFG, batch=1, max_seq=16, dtype=jnp.float32)
        t = jnp.asarray(toks[b : b + 1, : lens[b]], jnp.int32)
        _, cache = forward(CFG, params, t, cache, jnp.zeros((1,), jnp.int32))
        caches.append(cache)
        h, _ = forward(
            CFG, params, jnp.asarray(toks[b : b + 1, 9:10], jnp.int32), cache,
            jnp.full((1,), lens[b], jnp.int32),
        )
        per_seq_logits.append(np.asarray(logits_from_hidden(CFG, params, h))[0, 0])

    # Batched: combine the two caches and decode together.
    cache = KVCache(
        jnp.concatenate([c.k for c in caches], axis=1),
        jnp.concatenate([c.v for c in caches], axis=1),
    )
    h, _ = forward(
        CFG, params, jnp.asarray(toks[:, 9:10], jnp.int32), cache,
        jnp.asarray(lens, jnp.int32),
    )
    got = np.asarray(logits_from_hidden(CFG, params, h))[:, 0]
    np.testing.assert_allclose(got[0], per_seq_logits[0], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(got[1], per_seq_logits[1], atol=1e-4, rtol=1e-4)


def test_init_params_shapes():
    params = init_params(CFG, jax.random.PRNGKey(0))
    assert params.tok_embd.shape == (CFG.n_vocab, CFG.n_embd)
    assert params.layers.wq.shape == (CFG.n_layer, CFG.n_embd, CFG.n_embd)
    assert params.layers.w2.shape == (CFG.n_layer, CFG.n_ff, CFG.n_embd)
    assert params.output.shape == (CFG.n_embd, CFG.n_vocab)


def test_rope_half_permutation_equivalence(rng):
    """rope_half_params + style='half' == original interleaved forward.

    The loader applies this permutation at load time (runtime/loader.py)
    so the per-step RoPE avoids even/odd lane deinterleaves; attention
    is invariant to the fixed head-dim permutation of q and k.
    """
    import dataclasses

    import sys
    sys.path.insert(0, "tests")
    from helpers import make_ggml_weights

    from tokenhawk_tpu.models.llama import (
        KVCache,
        forward,
        params_from_ggml,
        rope_half_params,
    )

    cfg = LlamaConfig.tiny(n_vocab=96, n_embd=64, n_head=4, n_layer=2,
                           n_ff=128, n_ctx=32)
    params = params_from_ggml(cfg, make_ggml_weights(cfg, rng), dtype=jnp.float32)
    cfg2, params2 = rope_half_params(cfg, params)
    assert cfg2.rope_style == "half"

    tokens = jnp.asarray(rng.integers(3, 96, (2, 8)), jnp.int32)
    offsets = jnp.zeros((2,), jnp.int32)
    h1, c1 = forward(cfg, params, tokens, KVCache.create(cfg, 2, 32, jnp.float32), offsets)
    h2, c2 = forward(cfg2, params2, tokens, KVCache.create(cfg, 2, 32, jnp.float32), offsets)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=2e-5, rtol=1e-4)

    # decode step equivalence on top of the prefilled caches
    last = jnp.asarray([[5], [7]], jnp.int32)
    off = jnp.full((2,), 8, jnp.int32)
    d1, _ = forward(cfg, params, last, c1, off)
    d2, _ = forward(cfg2, params2, last, c2, off)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=2e-5, rtol=1e-4)
