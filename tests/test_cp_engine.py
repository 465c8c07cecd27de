"""Context parallelism end-to-end: Engine-driven generation over a
sequence-sharded KV cache (cyclic layout, parallel/cp.py) vs the
single-device reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.models.llama import (
    fuse_params,
    params_from_ggml,
    unstack_params,
)
from tokenhawk_tpu.parallel.mesh import make_cp_mesh
from tokenhawk_tpu.runtime.engine import Engine
from tokenhawk_tpu.tokenizer import byte_fallback_vocab

from helpers import make_ggml_weights

CFG = LlamaConfig.tiny(n_vocab=512, n_embd=256, n_head=4, n_ctx=64, n_ff=512)
GREEDY = SamplingConfig(temperature=0.0)


@pytest.fixture(scope="module")
def both_params():
    tensors = make_ggml_weights(CFG, np.random.default_rng(77))
    ref = params_from_ggml(CFG, tensors, dtype=jnp.float32)
    cp = unstack_params(fuse_params(
        params_from_ggml(CFG, tensors, dtype=jnp.float32)))
    return ref, cp


@pytest.mark.parametrize("ncp", [2, 4])
def test_cp_engine_generation_matches(both_params, ncp):
    """Greedy generation over the (data, ctx) mesh == single device,
    with a prompt LONGER than one shard's KV capacity (S/ncp)."""
    ref_params, cp_params = both_params
    mesh = make_cp_mesh(dp=1, cp=ncp)
    tok = byte_fallback_vocab()

    e_ref = Engine(CFG, ref_params, tokenizer=tok, sampling=GREEDY,
                   cache_dtype=jnp.float32, decode_chunk=4)
    e_cp = Engine(CFG, cp_params, tokenizer=tok, sampling=GREEDY,
                  cache_dtype=jnp.float32, decode_chunk=4,
                  mesh=mesh, parallel="cp")

    S_loc = e_cp.max_seq // ncp
    n = min(2 * S_loc, e_cp.max_seq - 12)
    prompt = [1] + [(7 * i) % 500 + 3 for i in range(n)]
    assert len(prompt) > S_loc  # spans multiple ctx shards

    want = e_ref.generate(prompt, max_new_tokens=8).tokens
    got = e_cp.generate(prompt, max_new_tokens=8).tokens
    assert got == want


def test_cp_engine_dp_batch(both_params):
    """CP composes with data parallelism: a (2, 2) mesh decodes."""
    _, cp_params = both_params
    mesh = make_cp_mesh(dp=2, cp=2)
    e_cp = Engine(CFG, cp_params, sampling=GREEDY, cache_dtype=jnp.float32,
                  decode_chunk=4, batch_size=2, mesh=mesh, parallel="cp")
    cache = e_cp.new_cache(batch=2)
    cache, logits, lens = e_cp.prefill(cache, [[1, 5, 9, 13], [1, 2, 3]])
    assert logits.shape == (2, CFG.n_vocab)
    last = jnp.argmax(logits, -1).astype(jnp.int32)
    last_n = jnp.full((2, 4), -1, jnp.int32)
    done = jnp.zeros((2,), bool)
    cache, toks, *_ = e_cp._decode(
        e_cp.params, cache, last, jnp.asarray(lens), last_n, done,
        jax.random.PRNGKey(0),
    )
    assert np.asarray(toks).shape == (2, 4)


def test_cp_long_context_beyond_single_shard(both_params):
    """Decode far past one shard's capacity: the cyclic layout keeps
    appending round-robin and attention stays exact."""
    ref_params, cp_params = both_params
    ncp = 4
    mesh = make_cp_mesh(dp=1, cp=ncp)
    e_ref = Engine(CFG, ref_params, sampling=GREEDY, cache_dtype=jnp.float32,
                   decode_chunk=4)
    e_cp = Engine(CFG, cp_params, sampling=GREEDY, cache_dtype=jnp.float32,
                  decode_chunk=4, mesh=mesh, parallel="cp")
    prompt = [1, 9, 17, 33, 2, 4]
    want = e_ref.generate(prompt, max_new_tokens=40).tokens
    got = e_cp.generate(prompt, max_new_tokens=40).tokens
    assert got == want
    assert len(got) + len(prompt) > e_cp.max_seq // ncp  # crossed shards
