"""End-to-end: write a GGML file, load_model(), generate."""

import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.ggml.format import GGMLType
from tokenhawk_tpu.ggml.quants import quantize
from tokenhawk_tpu.ggml.writer import write_ggml
from tokenhawk_tpu.models.llama import params_from_ggml
from tokenhawk_tpu.runtime.engine import Engine
from tokenhawk_tpu.runtime.loader import load_model

from helpers import make_ggml_weights

CFG = LlamaConfig.tiny(n_vocab=300, n_embd=128, n_head=2, n_layer=2, n_ff=256)
VOCAB = [b"<unk>", b"<s>", b"</s>"] + [bytes([b]) for b in range(256)] + [
    b"he", b"ll", b"llo", b"hello"]
SCORES = [0.0] * 259 + [-1.0, -2.0, -1.5, -0.5]


def _write_model(tmp_path, kind=None):
    rng = np.random.default_rng(5)
    tensors = make_ggml_weights(CFG, rng)
    if kind is not None:
        tensors = {
            k: (quantize(v, kind)
                if v.ndim == 2 and "norm" not in k and k != "tok_embeddings.weight"
                else v)
            for k, v in tensors.items()
        }
    hp = dict(n_vocab=len(VOCAB), n_embd=CFG.n_embd, n_mult=CFG.n_mult,
              n_head=CFG.n_head, n_layer=CFG.n_layer,
              n_rot=CFG.head_dim, ftype=1)
    path = tmp_path / "model.bin"
    write_ggml(path, hp, VOCAB, SCORES, tensors)
    return path, tensors


def test_load_f32_and_generate(tmp_path):
    path, _ = _write_model(tmp_path)
    cfg, params, tok = load_model(str(path), n_ctx=64, dtype=jnp.float32,
                                  n_vocab=CFG.n_vocab)
    assert cfg.n_embd == CFG.n_embd and cfg.n_layer == CFG.n_layer
    assert tok.n_vocab == len(VOCAB)
    eng = Engine(cfg, params, tokenizer=tok,
                 sampling=SamplingConfig(temperature=0.0),
                 cache_dtype=jnp.float32, decode_chunk=4)
    res = eng.generate("hello", max_new_tokens=5)
    assert len(res.tokens) <= 5


@pytest.mark.parametrize("kind", [GGMLType.Q8_0, GGMLType.Q4_0])
def test_native_fast_path_matches_generic(tmp_path, kind, monkeypatch):
    """load_model's native one-pass decode == generic numpy conversion."""
    # Byte-exact payload comparison: disable the rope-half column
    # permutation (covered by test_rope_half_permutation_equivalence).
    monkeypatch.setenv("THAWK_ROPE_HALF", "0")
    path, tensors = _write_model(tmp_path, kind)
    cfg, params_fast, _ = load_model(str(path), n_ctx=64, dtype=jnp.float32,
                                     scale_dtype=jnp.float32,
                                     n_vocab=CFG.n_vocab)
    params_ref = params_from_ggml(cfg, tensors, dtype=jnp.float32)

    # load_model fuses + unrolls: compare each layer's wqkv against the
    # concat of the reference, and w2 scales per layer.
    assert isinstance(params_fast.layers, tuple)
    for l, lp in enumerate(params_fast.layers):
        want_qkv = np.concatenate(
            [np.asarray(params_ref.layers.wq.qs[l]),
             np.asarray(params_ref.layers.wk.qs[l]),
             np.asarray(params_ref.layers.wv.qs[l])], axis=-1)
        np.testing.assert_array_equal(np.asarray(lp.wqkv.qs), want_qkv)
        np.testing.assert_allclose(
            np.asarray(lp.w2.scales),
            np.asarray(params_ref.layers.w2.scales[l]), rtol=1e-6,
        )
    np.testing.assert_array_equal(
        np.asarray(params_fast.output.qs), np.asarray(params_ref.output.qs)
    )
