import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig
from tokenhawk_tpu.ggml.format import GGMLType
from tokenhawk_tpu.ggml.quants import quantize
from tokenhawk_tpu.models.llama import params_from_ggml
from tokenhawk_tpu.models.reference_numpy import forward_np
from tokenhawk_tpu.runtime.eval import make_score_fn, perplexity

from helpers import make_ggml_weights

CFG = LlamaConfig.tiny(n_vocab=256, n_ctx=64)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(23)
    tensors = make_ggml_weights(CFG, rng)
    params = params_from_ggml(CFG, tensors, dtype=jnp.float32)
    return rng, tensors, params


def test_score_matches_oracle(setup):
    rng, tensors, params = setup
    toks = rng.integers(0, CFG.n_vocab, size=16)
    score = make_score_fn(CFG, 16)
    # the score fn uses a bf16 cache internally; rebuild the expectation in f64
    lp = np.asarray(score(params, jnp.asarray(toks[None, :], jnp.int32)))[0]
    logits = forward_np(CFG, tensors, toks)
    ref_lp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
    want = ref_lp[np.arange(15), toks[1:]]
    np.testing.assert_allclose(lp, want, atol=5e-2, rtol=1e-2)


def test_perplexity_positive_and_finite(setup):
    rng, _, params = setup
    toks = rng.integers(0, CFG.n_vocab, size=64)
    ppl = perplexity(CFG, params, toks, window=32)
    assert np.isfinite(ppl) and ppl > 1.0


def test_quantized_ppl_close_to_dense(setup):
    """Q8_0 weight-only quantization perturbs ppl only slightly."""
    rng, tensors, params = setup
    toks = rng.integers(0, CFG.n_vocab, size=64)
    ppl_f32 = perplexity(CFG, params, toks, window=32)

    qt = {
        k: (quantize(v, GGMLType.Q8_0)
            if v.ndim == 2 and "norm" not in k and k != "tok_embeddings.weight"
            else v)
        for k, v in tensors.items()
    }
    params_q8 = params_from_ggml(CFG, qt, dtype=jnp.float32)
    ppl_q8 = perplexity(CFG, params_q8, toks, window=32)
    # random tiny model ppl ~ n_vocab; q8 should stay within a few percent.
    assert abs(np.log(ppl_q8) - np.log(ppl_f32)) < 0.05
