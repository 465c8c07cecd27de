"""fuse_params (wqkv / w13) produces identical outputs to unfused."""

import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.ggml.format import GGMLType
from tokenhawk_tpu.ggml.quants import quantize
from tokenhawk_tpu.models.llama import fuse_params, params_from_ggml
from tokenhawk_tpu.runtime.engine import Engine

from helpers import make_ggml_weights

CFG = LlamaConfig.tiny(n_vocab=512, n_ctx=64)
CFG_GQA = LlamaConfig.tiny(n_vocab=512, n_ctx=64, n_kv_head=2)
GREEDY = SamplingConfig(temperature=0.0)


def _gen(cfg, params, prompt=(1, 9, 42), n=8):
    eng = Engine(cfg, params, sampling=GREEDY, cache_dtype=jnp.float32,
                 decode_chunk=4)
    return eng.generate(list(prompt), max_new_tokens=n).tokens


@pytest.mark.parametrize("cfg", [CFG, CFG_GQA])
def test_fused_dense_matches(cfg):
    tensors = make_ggml_weights(cfg, np.random.default_rng(41))
    params = params_from_ggml(cfg, tensors, dtype=jnp.float32)
    fused = fuse_params(params_from_ggml(cfg, tensors, dtype=jnp.float32))
    assert fused.layers.wqkv is not None and fused.layers.wq is None
    assert _gen(cfg, fused) == _gen(cfg, params)


@pytest.mark.parametrize("kind", [GGMLType.Q8_0, GGMLType.Q4_0])
def test_fused_quant_matches(kind):
    tensors = make_ggml_weights(CFG, np.random.default_rng(42))
    qt = {
        k: (quantize(v, kind)
            if v.ndim == 2 and "norm" not in k and k != "tok_embeddings.weight"
            else v)
        for k, v in tensors.items()
    }
    params = params_from_ggml(CFG, qt, dtype=jnp.float32)
    fused = fuse_params(params_from_ggml(CFG, qt, dtype=jnp.float32))
    D, F = CFG.n_embd, CFG.n_ff
    if kind == GGMLType.Q4_0:
        assert fused.layers.wqkv.qs.shape == (CFG.n_layer, D // 2, 3 * D)
        assert fused.layers.w13.qs.shape == (CFG.n_layer, D // 2, 2 * F)
    assert _gen(CFG, fused) == _gen(CFG, params)


def test_unrolled_matches_stacked():
    from tokenhawk_tpu.models.llama import unstack_params

    tensors = make_ggml_weights(CFG, np.random.default_rng(43))
    params = params_from_ggml(CFG, tensors, dtype=jnp.float32)
    unrolled = unstack_params(fuse_params(
        params_from_ggml(CFG, tensors, dtype=jnp.float32)))
    assert isinstance(unrolled.layers, tuple)
    assert _gen(CFG, unrolled) == _gen(CFG, params)


def test_unrolled_quant_matches():
    from tokenhawk_tpu.ggml.format import GGMLType
    from tokenhawk_tpu.models.llama import unstack_params

    tensors = make_ggml_weights(CFG, np.random.default_rng(44))
    qt = {
        k: (quantize(v, GGMLType.Q4_0)
            if v.ndim == 2 and "norm" not in k and k != "tok_embeddings.weight"
            else v)
        for k, v in tensors.items()
    }
    params = params_from_ggml(CFG, qt, dtype=jnp.float32)
    unrolled = unstack_params(params_from_ggml(CFG, qt, dtype=jnp.float32))
    assert _gen(CFG, unrolled) == _gen(CFG, params)
