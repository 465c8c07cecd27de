"""Tensor/data-parallel execution on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.models.llama import KVCache, forward, logits_from_hidden, params_from_ggml
from tokenhawk_tpu.ops.qweight import QWeight, quantize_array
from tokenhawk_tpu.parallel import make_mesh, shard_kv_cache, shard_params
from tokenhawk_tpu.runtime.engine import Engine
from tokenhawk_tpu.tokenizer import byte_fallback_vocab

from helpers import make_ggml_weights

CFG = LlamaConfig.tiny(n_vocab=512, n_ctx=64)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    tensors = make_ggml_weights(CFG, rng)
    params = params_from_ggml(CFG, tensors, dtype=jnp.float32)
    return tensors, params


def _logits(cfg, params, cache, tokens, offsets):
    h, cache = forward(cfg, params, tokens, cache, offsets)
    return logits_from_hidden(cfg, params, h), cache


@pytest.mark.parametrize("dp,tp", [(1, 4), (2, 2), (1, 2)])
def test_sharded_forward_matches_single_device(setup, dp, tp):
    _, params = setup
    mesh = make_mesh(dp=dp, tp=tp)
    B = 2
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, CFG.n_vocab, (B, 8)), jnp.int32)
    offsets = jnp.zeros((B,), jnp.int32)

    cache = KVCache.create(CFG, B, 32, jnp.float32)
    want, _ = jax.jit(_logits, static_argnums=0)(CFG, params, cache, tokens, offsets)

    sp = shard_params(CFG, params, mesh)
    sc = shard_kv_cache(KVCache.create(CFG, B, 32, jnp.float32), mesh)
    got, new_cache = jax.jit(_logits, static_argnums=0)(CFG, sp, sc, tokens, offsets)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)
    # KV cache sharding is preserved through the step (no silent gather).
    assert "model" in str(new_cache.k.sharding.spec)


def test_sharded_quantized_forward(setup):
    tensors, _ = setup
    # Quantize the FFN + attention projection weights, shard, run.
    from tokenhawk_tpu.ggml.quants import quantize
    from tokenhawk_tpu.ggml.format import GGMLType

    qt = {
        k: (quantize(v, GGMLType.Q8_0) if v.ndim == 2 and "norm" not in k and "tok_embd" not in k and k != "tok_embeddings.weight" else v)
        for k, v in tensors.items()
    }
    params_q = params_from_ggml(CFG, qt, dtype=jnp.float32)
    assert isinstance(params_q.layers.wq, QWeight)

    mesh = make_mesh(dp=1, tp=4)
    sp = shard_params(CFG, params_q, mesh)
    B = 1
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    cache = shard_kv_cache(KVCache.create(CFG, B, 16, jnp.float32), mesh)
    got, _ = jax.jit(_logits, static_argnums=0)(CFG, sp, cache, tokens, jnp.zeros((B,), jnp.int32))

    params_dense = params_from_ggml(CFG, qt, dtype=jnp.float32)
    cache2 = KVCache.create(CFG, B, 16, jnp.float32)
    want, _ = jax.jit(_logits, static_argnums=0)(CFG, params_dense, cache2, tokens, jnp.zeros((B,), jnp.int32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_engine_on_mesh_matches_unsharded(setup):
    _, params = setup
    mesh = make_mesh(dp=1, tp=4)
    sp = shard_params(CFG, params, mesh)
    tok = byte_fallback_vocab()
    greedy = SamplingConfig(temperature=0.0)

    e1 = Engine(CFG, params, tokenizer=tok, sampling=greedy,
                cache_dtype=jnp.float32, decode_chunk=4)
    e2 = Engine(CFG, sp, tokenizer=tok, sampling=greedy,
                cache_dtype=jnp.float32, decode_chunk=4, mesh=mesh)
    r1 = e1.generate([1, 9, 17], max_new_tokens=8)
    r2 = e2.generate([1, 9, 17], max_new_tokens=8)
    assert r1.tokens == r2.tokens


def test_tp_must_divide_kv_heads(setup):
    _, params = setup
    mesh = make_mesh(dp=1, tp=8)  # tiny config has 4 heads
    with pytest.raises(ValueError):
        shard_params(CFG, params, mesh)


def test_multihost_global_mesh_single_process():
    from tokenhawk_tpu.parallel.multihost import global_mesh, initialize_distributed

    initialize_distributed()  # no-op in single process
    mesh = global_mesh(dp=2, tp=4)
    assert mesh.shape == {"data": 2, "model": 4}
    with pytest.raises(ValueError):
        global_mesh(dp=3, tp=3)
