"""BASELINE config shape runs: 13B and 70B TP step functions trace and
shard correctly on the 8-device virtual mesh (abstract lowering — no
weights materialized; the real run needs real chips)."""

import jax
import jax.numpy as jnp
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.models.llama import KVCache, LayerParams, LlamaParams
from tokenhawk_tpu.parallel import make_mesh
from tokenhawk_tpu.parallel.tp import (
    make_tp_decode_fn,
    make_tp_prefill_fn,
    validate_tp,
)

GREEDY = SamplingConfig(temperature=0.0)


def _abstract_params(cfg: LlamaConfig, dtype=jnp.bfloat16):
    D, F, V, L, Dkv = cfg.n_embd, cfg.n_ff, cfg.n_vocab, cfg.n_layer, cfg.n_embd_kv

    def a(*shape):
        return jax.ShapeDtypeStruct(shape, dtype)

    layers = LayerParams(
        wq=a(L, D, D), wk=a(L, D, Dkv), wv=a(L, D, Dkv), wo=a(L, D, D),
        w1=a(L, D, F), w2=a(L, F, D), w3=a(L, D, F),
        attn_norm=a(L, D), ffn_norm=a(L, D),
    )
    return LlamaParams(tok_embd=a(V, D), layers=layers, norm=a(D),
                       output=a(D, V))


@pytest.mark.parametrize("cfg_name,tp", [("llama_13b", 4), ("llama2_70b", 8)])
def test_tp_step_lowers_at_scale(cfg_name, tp):
    cfg = getattr(LlamaConfig, cfg_name)(n_ctx=512)
    validate_tp(cfg, tp)
    mesh = make_mesh(dp=8 // tp, tp=tp)
    B, S, chunk = 8 // tp, 512, 4

    params = _abstract_params(cfg)
    cache = jax.ShapeDtypeStruct(
        (cfg.n_layer, B, cfg.n_kv_head, S, cfg.head_dim), jnp.bfloat16)
    cache = KVCache(cache, cache)

    prefill = make_tp_prefill_fn(cfg, mesh)
    lowered = prefill.lower(
        params, cache,
        jax.ShapeDtypeStruct((B, 128), jnp.int32),
        jax.ShapeDtypeStruct((B,), jnp.int32),
        jax.ShapeDtypeStruct((B,), jnp.int32),
    )
    assert "stablehlo" in lowered.as_text()[:4000] or lowered is not None

    decode = make_tp_decode_fn(cfg, mesh, GREEDY, chunk)
    lowered_d = decode.lower(
        params, cache,
        jax.ShapeDtypeStruct((B,), jnp.int32),
        jax.ShapeDtypeStruct((B,), jnp.int32),
        jax.ShapeDtypeStruct((B, 64), jnp.int32),
        jax.ShapeDtypeStruct((B,), bool),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    assert lowered_d is not None
