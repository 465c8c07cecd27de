import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.models.llama import KVCache, forward, logits_from_hidden, params_from_ggml
from tokenhawk_tpu.runtime.engine import Engine
from tokenhawk_tpu.tokenizer import byte_fallback_vocab

from helpers import make_ggml_weights

CFG = LlamaConfig.tiny(n_vocab=512, n_ctx=64)
GREEDY = SamplingConfig(temperature=0.0)


@pytest.fixture(scope="module")
def engine():
    rng = np.random.default_rng(1)
    tensors = make_ggml_weights(CFG, rng)
    params = params_from_ggml(CFG, tensors, dtype=jnp.float32)
    tok = byte_fallback_vocab()
    return Engine(
        CFG, params, tokenizer=tok, sampling=GREEDY,
        cache_dtype=jnp.float32, decode_chunk=4,
    )


def test_greedy_generation_deterministic(engine):
    prompt = [1, 5, 9, 13]
    r1 = engine.generate(prompt, max_new_tokens=12)
    r2 = engine.generate(prompt, max_new_tokens=12)
    assert r1.tokens == r2.tokens
    assert len(r1.tokens) <= 12
    assert r1.prompt_tokens == 4


def test_greedy_matches_manual_loop(engine):
    """Engine output == hand-rolled forward+argmax loop (no cache reuse bugs)."""
    prompt = [1, 7, 21, 42, 63]
    res = engine.generate(prompt, max_new_tokens=8)

    cfg, params = engine.cfg, engine.params
    cache = KVCache.create(cfg, 1, engine.max_seq, jnp.float32)
    toks = list(prompt)
    h, cache = forward(cfg, params, jnp.asarray([toks], jnp.int32), cache,
                       jnp.zeros((1,), jnp.int32))
    manual = []
    nxt = int(np.argmax(np.asarray(logits_from_hidden(cfg, params, h))[0, -1]))
    for i in range(8):
        if nxt == 2:
            break
        manual.append(nxt)
        h, cache = forward(cfg, params, jnp.asarray([[nxt]], jnp.int32), cache,
                           jnp.asarray([len(toks) + i], jnp.int32))
        nxt = int(np.argmax(np.asarray(logits_from_hidden(cfg, params, h))[0, 0]))
    assert res.tokens[: len(manual)] == manual


def test_streaming_callback_order(engine):
    seen = []
    res = engine.generate([1, 3], max_new_tokens=6, on_token=seen.append)
    assert seen == res.tokens


def test_context_overflow_rejected(engine):
    with pytest.raises(ValueError):
        engine.generate(list(range(1, engine.max_seq + 2)), max_new_tokens=1)


def test_generation_respects_budget(engine):
    res = engine.generate([1, 2, 3], max_new_tokens=5)
    assert len(res.tokens) <= 5


def test_stochastic_sampling_runs():
    rng = np.random.default_rng(2)
    tensors = make_ggml_weights(CFG, rng)
    params = params_from_ggml(CFG, tensors, dtype=jnp.float32)
    eng = Engine(
        CFG, params, tokenizer=byte_fallback_vocab(),
        sampling=SamplingConfig(temperature=0.8, top_k=40, top_p=0.95),
        cache_dtype=jnp.float32, decode_chunk=4,
    )
    res = eng.generate([1, 5, 7], max_new_tokens=10)
    assert all(0 <= t < CFG.n_vocab for t in res.tokens)


def test_done_slots_do_not_advance_offsets(engine):
    """A done/idle slot must freeze its offset: in long-lived serving an
    unbounded offset walks past the cache end (OOB DMA risk in the
    length-aware decode kernel)."""
    from tokenhawk_tpu.runtime.engine import make_decode_fn

    cfg, params = engine.cfg, engine.params
    B, chunk = 2, 4
    cache = KVCache.create(cfg, B, engine.max_seq, jnp.float32)
    decode = make_decode_fn(cfg, GREEDY, chunk)
    offsets = jnp.asarray([5, 7], jnp.int32)
    done = jnp.asarray([False, True])
    last_n = jnp.full((B, 4), -1, jnp.int32)
    last = jnp.asarray([3, 3], jnp.int32)
    cache, toks, offsets, last_n, done = decode(
        params, cache, last, offsets, last_n, done, jax.random.PRNGKey(0)
    )
    offs = np.asarray(offsets)
    assert offs[1] == 7  # frozen
    # slot 0 advances (unless it hit EOS mid-chunk, in which case less)
    assert 5 < offs[0] <= 5 + chunk


def test_decode_near_cache_edge_clamps(engine):
    """Decoding with offsets at/over the cache edge must not fault: the
    attention length is clamped to the cache capacity."""
    from tokenhawk_tpu.runtime.engine import make_decode_fn

    cfg, params = engine.cfg, engine.params
    S = engine.max_seq
    cache = KVCache.create(cfg, 1, S, jnp.float32)
    decode = make_decode_fn(cfg, GREEDY, 4)
    offsets = jnp.asarray([S - 1], jnp.int32)
    done = jnp.asarray([False])
    last_n = jnp.full((1, 4), -1, jnp.int32)
    cache, toks, offsets, last_n, done = decode(
        params, cache, jnp.asarray([3], jnp.int32), offsets, last_n, done,
        jax.random.PRNGKey(0),
    )
    assert np.asarray(toks).shape == (1, 4)  # no crash; output well-formed


def test_engine_prompt_uses_dummy_prefix(engine):
    """String prompts get the SentencePiece dummy prefix (leading space),
    matching the reference (/root/reference/th-llama.cpp:122)."""
    ids = engine.tokenizer.encode_prompt("Hi", add_bos=True)
    assert ids == engine.tokenizer.encode(" Hi", add_bos=True)
