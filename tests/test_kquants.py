"""k-quant (Q4_K / Q6_K) codecs and the GGUF -> Q8_0 load path."""

import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.ggml.format import GGMLType
from tokenhawk_tpu.ggml.gguf import GGUFFile, RawTensor, write_gguf
from tokenhawk_tpu.ggml.kquants import (
    QK_K,
    dequant_q4_k,
    dequant_q6_k,
    quantize_q4_k,
    quantize_q6_k,
)
from tokenhawk_tpu.runtime.loader import load_model

from helpers import make_ggml_weights
from test_gguf import _metadata, _to_gguf_name

CFG = LlamaConfig.tiny(n_vocab=300, n_embd=256, n_head=4, n_layer=2,
                       n_ff=256)


def test_q4_k_roundtrip(rng):
    x = rng.standard_normal(4 * QK_K).astype(np.float32)
    y = dequant_q4_k(quantize_q4_k(x), x.size)
    # 4-bit affine with 6-bit super-scales: a few percent
    assert np.abs(y - x).max() <= 0.08 * np.abs(x).max()


def test_q6_k_roundtrip(rng):
    x = rng.standard_normal(4 * QK_K).astype(np.float32)
    y = dequant_q6_k(quantize_q6_k(x), x.size)
    assert np.abs(y - x).max() <= 0.03 * np.abs(x).max()


def test_q4_k_scale_pack_unpack_exact(rng):
    """The 6-bit (scale, min) packing is bijective for all 64 values."""
    from tokenhawk_tpu.ggml.kquants import _unpack_scale_min_k4

    # craft one block whose sub-scales hit high 6-bit codes (>15, needing
    # the split-field encoding for j >= 4)
    x = np.concatenate([
        rng.standard_normal(32).astype(np.float32) * (1.0 + 3 * j)
        for j in range(8)
    ])
    raw = quantize_q4_k(x)
    buf = np.frombuffer(raw, np.uint8).reshape(1, 144)
    sc, mn = _unpack_scale_min_k4(buf[:, 4:16])
    assert sc.max() > 15 or mn.max() > 15  # exercised the split fields
    y = dequant_q4_k(raw, x.size)
    assert np.abs(y - x).max() <= 0.08 * np.abs(x).max()


@pytest.mark.parametrize("kind", [GGMLType.Q4_K, GGMLType.Q6_K])
def test_gguf_kquant_load_and_generate(tmp_path, kind):
    """A GGUF file with k-quant projections loads (requantized to Q8_0
    on the device path) and generates; dequant matches the codec."""
    from tokenhawk_tpu.runtime.engine import Engine

    rng = np.random.default_rng(9)
    tensors = make_ggml_weights(CFG, rng)
    out = {}
    qfn = quantize_q4_k if kind == GGMLType.Q4_K else quantize_q6_k
    for name, v in tensors.items():
        if v.ndim == 2 and "norm" not in name and \
                name != "tok_embeddings.weight" and v.size % QK_K == 0:
            out[_to_gguf_name(name)] = RawTensor(kind, v.shape,
                                                 qfn(v.reshape(-1)))
        else:
            out[_to_gguf_name(name)] = v
    md = _metadata(CFG.n_vocab)
    md["llama.embedding_length"] = CFG.n_embd
    md["llama.rope.dimension_count"] = CFG.head_dim
    path = tmp_path / "kq.gguf"
    write_gguf(path, md, out)

    f = GGUFFile(path)
    got = np.asarray(f.load_tensor("layers.0.attention.wq.weight"))
    want = dequant_q4_k(
        qfn(tensors["layers.0.attention.wq.weight"].reshape(-1)),
        got.size).reshape(got.shape) if kind == GGMLType.Q4_K else \
        dequant_q6_k(qfn(tensors["layers.0.attention.wq.weight"].reshape(-1)),
                     got.size).reshape(got.shape)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    f.close()

    cfg, params, tok = load_model(str(path), n_ctx=64)
    from tokenhawk_tpu.ops.qweight import QWeight

    lp = params.layers[0] if isinstance(params.layers, tuple) else params.layers
    assert isinstance(lp.wqkv if lp.wqkv is not None else lp.wq, QWeight)
    eng = Engine(cfg, params, tokenizer=tok,
                 sampling=SamplingConfig(temperature=0.0), decode_chunk=4)
    res = eng.generate("hello", max_new_tokens=4)
    assert len(res.tokens) <= 4


def test_q5_k_roundtrip(rng):
    from tokenhawk_tpu.ggml.kquants import dequant_q5_k, quantize_q5_k

    x = rng.standard_normal(4 * QK_K).astype(np.float32)
    y = dequant_q5_k(quantize_q5_k(x), x.size)
    assert np.abs(y - x).max() <= 0.05 * np.abs(x).max()


def test_q5_k_gguf_load(tmp_path):
    from tokenhawk_tpu.ggml.kquants import dequant_q5_k, quantize_q5_k

    rng = np.random.default_rng(10)
    tensors = make_ggml_weights(CFG, rng)
    out = {}
    for name, v in tensors.items():
        if v.ndim == 2 and "norm" not in name and \
                name != "tok_embeddings.weight" and v.size % QK_K == 0:
            out[_to_gguf_name(name)] = RawTensor(
                GGMLType.Q5_K, v.shape, quantize_q5_k(v.reshape(-1)))
        else:
            out[_to_gguf_name(name)] = v
    md = _metadata(CFG.n_vocab)
    md["llama.embedding_length"] = CFG.n_embd
    md["llama.rope.dimension_count"] = CFG.head_dim
    path = tmp_path / "q5k.gguf"
    write_gguf(path, md, out)
    f = GGUFFile(path)
    got = np.asarray(f.load_tensor("layers.0.attention.wq.weight"))
    want = dequant_q5_k(
        quantize_q5_k(tensors["layers.0.attention.wq.weight"].reshape(-1)),
        got.size).reshape(got.shape)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    f.close()
    cfg, params, tok = load_model(str(path), n_ctx=64)
    assert cfg.n_embd == CFG.n_embd
