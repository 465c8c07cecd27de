"""End-to-end parity: pallas-interpret backend vs XLA backend.

Exercises the exact compute path that runs on TPU (flash prefill,
flash decode, fused quant matmuls) against the portable XLA path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.ggml.format import GGMLType
from tokenhawk_tpu.ggml.quants import quantize
from tokenhawk_tpu.models.llama import params_from_ggml
from tokenhawk_tpu.ops import dispatch
from tokenhawk_tpu.runtime.engine import Engine

from helpers import make_ggml_weights

# Pallas-eligible dims: head_dim 128, ctx multiple of 128.
CFG = LlamaConfig.tiny(n_vocab=512, n_embd=256, n_head=2, n_ctx=128, n_ff=512)
GREEDY = SamplingConfig(temperature=0.0)


@pytest.fixture(autouse=True)
def _restore_backend():
    yield
    dispatch.set_backend("auto")


def _quantize_tensors(tensors, kind):
    return {
        k: (quantize(v, kind)
            if v.ndim == 2 and "norm" not in k and k != "tok_embeddings.weight"
            else v)
        for k, v in tensors.items()
    }


def _generate(params, prompt, n):
    eng = Engine(CFG, params, sampling=GREEDY, cache_dtype=jnp.float32,
                 decode_chunk=4)
    return eng.generate(prompt, max_new_tokens=n).tokens


def test_dense_pallas_matches_xla(rng):
    tensors = make_ggml_weights(CFG, rng)
    params = params_from_ggml(CFG, tensors, dtype=jnp.float32)
    prompt = [1, 40, 80, 120, 160]

    dispatch.set_backend("xla")
    want = _generate(params, prompt, 6)
    dispatch.set_backend("pallas_interpret")
    got = _generate(params, prompt, 6)
    assert got == want


@pytest.mark.parametrize("kind", [GGMLType.Q8_0, GGMLType.Q4_0])
def test_quant_pallas_matches_xla(rng, kind):
    tensors = _quantize_tensors(make_ggml_weights(CFG, rng), kind)
    params = params_from_ggml(CFG, tensors, dtype=jnp.float32)
    prompt = [1, 17, 34, 51]

    dispatch.set_backend("xla")
    want = _generate(params, prompt, 5)
    dispatch.set_backend("pallas_interpret")
    got = _generate(params, prompt, 5)
    assert got == want
