"""GGUF reader: format round-trip, name translation, load_model e2e.

The reference loads only ggjt v1 (/root/reference/th-llama-loader.cpp);
GGUF is what llama.cpp has shipped since mid-2023, so real weight files
are GGUF — this is the path a weight-holder actually exercises.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.ggml.format import GGMLType
from tokenhawk_tpu.ggml.gguf import (
    GGUFFile,
    from_blocks_gguf,
    is_gguf,
    translate_name,
    write_gguf,
)
from tokenhawk_tpu.ggml.quants import dequantize, quantize
from tokenhawk_tpu.runtime.loader import load_model

from helpers import make_ggml_weights

CFG = LlamaConfig.tiny(n_vocab=300, n_embd=128, n_head=4, n_layer=2,
                       n_ff=256)

_GGUF_NAMES = {
    "tok_embeddings.weight": "token_embd.weight",
    "norm.weight": "output_norm.weight",
    "output.weight": "output.weight",
}


def _to_gguf_name(ggml_name: str) -> str:
    if ggml_name in _GGUF_NAMES:
        return _GGUF_NAMES[ggml_name]
    # layers.N.attention.wq.weight -> blk.N.attn_q.weight
    parts = ggml_name.split(".")
    i = parts[1]
    rest = ".".join(parts[2:])
    table = {
        "attention.wq.weight": "attn_q.weight",
        "attention.wk.weight": "attn_k.weight",
        "attention.wv.weight": "attn_v.weight",
        "attention.wo.weight": "attn_output.weight",
        "attention_norm.weight": "attn_norm.weight",
        "feed_forward.w1.weight": "ffn_gate.weight",
        "feed_forward.w2.weight": "ffn_down.weight",
        "feed_forward.w3.weight": "ffn_up.weight",
        "ffn_norm.weight": "ffn_norm.weight",
    }
    return f"blk.{i}.{table[rest]}"


def _metadata(n_vocab):
    tokens = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)]
    types = [2, 3, 3] + [6] * 256
    scores = [0.0] * 259
    tokens += ["▁he", "llo", "▁hello"]
    types += [1, 1, 1]
    scores += [-1.0, -2.0, -0.5]
    assert len(tokens) <= n_vocab
    while len(tokens) < n_vocab:
        tokens.append(f"tok{len(tokens)}")
        types.append(1)
        scores.append(-100.0)
    return {
        "general.architecture": "llama",
        "general.file_type": 1,
        "llama.embedding_length": CFG.n_embd,
        "llama.block_count": CFG.n_layer,
        "llama.attention.head_count": CFG.n_head,
        "llama.attention.head_count_kv": CFG.n_head,
        "llama.feed_forward_length": CFG.n_ff,
        "llama.rope.dimension_count": CFG.head_dim,
        "llama.attention.layer_norm_rms_epsilon": 1e-6,
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": scores,
        "tokenizer.ggml.token_type": types,
    }


def _write_model(tmp_path, kind=None):
    rng = np.random.default_rng(7)
    tensors = make_ggml_weights(CFG, rng)
    out = {}
    for name, v in tensors.items():
        if kind is not None and v.ndim == 2 and "norm" not in name \
                and name != "tok_embeddings.weight":
            qt = quantize(v, kind)
            # re-express through the GGUF block packer (f16 scales)
            out[_to_gguf_name(name)] = qt
        else:
            out[_to_gguf_name(name)] = v
    path = tmp_path / "model.gguf"
    write_gguf(path, _metadata(CFG.n_vocab), out)
    return path, tensors


def test_block_roundtrip_q8(rng):
    x = rng.standard_normal((4, 64)).astype(np.float32)
    qt = quantize(x, GGMLType.Q8_0)
    from tokenhawk_tpu.ggml.gguf import _pack_gguf_blocks

    raw = _pack_gguf_blocks(qt)
    qt2 = from_blocks_gguf(GGMLType.Q8_0, raw, x.shape)
    # payload codes identical; scales round-trip through f16
    np.testing.assert_array_equal(qt.qs, qt2.qs)
    np.testing.assert_allclose(qt.scales, qt2.scales, rtol=1e-3)


def test_block_roundtrip_q4(rng):
    x = rng.standard_normal((4, 64)).astype(np.float32)
    qt = quantize(x, GGMLType.Q4_0)
    from tokenhawk_tpu.ggml.gguf import _pack_gguf_blocks

    raw = _pack_gguf_blocks(qt)
    qt2 = from_blocks_gguf(GGMLType.Q4_0, raw, x.shape)
    np.testing.assert_array_equal(qt.qs, qt2.qs)
    np.testing.assert_allclose(qt.scales, qt2.scales, rtol=1e-3)


def test_name_translation():
    assert translate_name("token_embd.weight") == "tok_embeddings.weight"
    assert translate_name("blk.3.attn_q.weight") == "layers.3.attention.wq.weight"
    assert translate_name("blk.0.ffn_down.weight") == "layers.0.feed_forward.w2.weight"
    assert translate_name("output_norm.weight") == "norm.weight"
    assert translate_name("rope_freqs.weight") == "rope_freqs.weight"


def test_parse_and_tensors(tmp_path, rng):
    path, tensors = _write_model(tmp_path)
    assert is_gguf(path)
    f = GGUFFile(path)
    assert f.hparams.n_embd == CFG.n_embd
    assert f.hparams.n_layer == CFG.n_layer
    assert f.config_overrides["n_ff"] == CFG.n_ff
    # vocab conversion: byte tokens became single bytes, ▁ became space
    assert f.vocab.tokens[3 + 0x41] == b"A"
    assert f.vocab.tokens[259] == b" he"
    # f32 tensors round-trip exactly
    got = f.load_tensor("layers.0.attention.wq.weight")
    np.testing.assert_array_equal(
        np.asarray(got), tensors["layers.0.attention.wq.weight"])
    f.close()


def test_quantized_tensor_parse(tmp_path, rng):
    path, tensors = _write_model(tmp_path, GGMLType.Q8_0)
    f = GGUFFile(path)
    qt = f.load_tensor("layers.0.feed_forward.w2.weight")
    want = dequantize(quantize(
        tensors["layers.0.feed_forward.w2.weight"], GGMLType.Q8_0))
    got = dequantize(qt)
    # f16 scale rounding only
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    f.close()


@pytest.mark.parametrize("kind", [None, GGMLType.Q8_0, GGMLType.Q4_0])
def test_load_model_gguf_and_generate(tmp_path, kind):
    from tokenhawk_tpu.runtime.engine import Engine

    path, _ = _write_model(tmp_path, kind)
    dtype = jnp.float32 if kind is None else jnp.bfloat16
    cfg, params, tok = load_model(str(path), n_ctx=64, dtype=dtype)
    assert cfg.n_embd == CFG.n_embd and cfg.n_ff == CFG.n_ff
    eng = Engine(cfg, params, tokenizer=tok,
                 sampling=SamplingConfig(temperature=0.0),
                 cache_dtype=jnp.float32 if kind is None else jnp.bfloat16,
                 decode_chunk=4)
    res = eng.generate("hello", max_new_tokens=5)
    assert len(res.tokens) <= 5


def test_tied_embeddings_alias(tmp_path):
    rng = np.random.default_rng(3)
    tensors = make_ggml_weights(CFG, rng)
    out = {_to_gguf_name(n): v for n, v in tensors.items()
           if n != "output.weight"}
    path = tmp_path / "tied.gguf"
    write_gguf(path, _metadata(CFG.n_vocab), out)
    f = GGUFFile(path)
    assert "output.weight" in f.tensors
    np.testing.assert_array_equal(
        np.asarray(f.load_tensor("output.weight")),
        tensors["tok_embeddings.weight"])
    f.close()


def test_load_model_gguf_gqa(tmp_path):
    """GQA metadata (head_count_kv < head_count) flows through
    config_overrides into a working engine — the llama-2-70B-class
    shape every real GGUF GQA file carries."""
    from tokenhawk_tpu.runtime.engine import Engine

    gcfg = LlamaConfig.tiny(n_vocab=300, n_embd=128, n_head=4, n_layer=2,
                            n_ff=256, n_kv_head=2)
    rng = np.random.default_rng(11)
    tensors = make_ggml_weights(gcfg, rng)
    md = _metadata(gcfg.n_vocab)
    md["llama.attention.head_count_kv"] = 2
    out = {_to_gguf_name(n): v for n, v in tensors.items()}
    path = tmp_path / "gqa.gguf"
    write_gguf(path, md, out)

    cfg, params, tok = load_model(str(path), n_ctx=64, dtype=jnp.float32)
    assert cfg.n_kv_head == 2 and cfg.n_head == 4
    eng = Engine(cfg, params, tokenizer=tok,
                 sampling=SamplingConfig(temperature=0.0),
                 cache_dtype=jnp.float32, decode_chunk=4)
    res = eng.generate("hello", max_new_tokens=4)
    assert len(res.tokens) <= 4


def test_custom_alignment(tmp_path):
    """general.alignment other than 32 honors both writer and reader."""
    rng = np.random.default_rng(5)
    tensors = make_ggml_weights(CFG, rng)
    md = _metadata(CFG.n_vocab)
    md["general.alignment"] = 64
    out = {_to_gguf_name(n): v for n, v in tensors.items()}
    path = tmp_path / "a64.gguf"
    write_gguf(path, md, out)
    f = GGUFFile(path)
    got = f.load_tensor("layers.1.feed_forward.w3.weight")
    np.testing.assert_array_equal(
        np.asarray(got), tensors["layers.1.feed_forward.w3.weight"])
    f.close()


def test_unsupported_tensor_type_raises(tmp_path):
    rng = np.random.default_rng(5)
    tensors = make_ggml_weights(CFG, rng)
    out = {_to_gguf_name(n): v for n, v in tensors.items()}
    path = tmp_path / "bad.gguf"
    write_gguf(path, _metadata(CFG.n_vocab), out)
    # corrupt one tensor-info type field to an unsupported id (Q8_K=15)
    data = bytearray(path.read_bytes())
    import struct as _s

    # find the first tensor name in the info section and break its type
    name = b"token_embd.weight"
    i = data.find(_s.pack("<Q", len(name)) + name)
    assert i > 0
    ndims_off = i + 8 + len(name)
    (ndims,) = _s.unpack_from("<I", data, ndims_off)
    ty_off = ndims_off + 4 + 8 * ndims
    _s.pack_into("<I", data, ty_off, 15)
    path.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="unsupported GGUF tensor type"):
        GGUFFile(path)


def test_unknown_tokenizer_model_rejected(tmp_path):
    """gpt2 (byte-level BPE) vocabs are supported (tokenizer_bpe.py; the
    full path is covered in test_tokenizer_bpe.py) — but a gpt2 file
    without its merge table must refuse at build_tokenizer, and a truly
    unknown tokenizer model must refuse at parse: applying the wrong
    conventions silently tokenizes wrong."""
    rng = np.random.default_rng(6)
    tensors = make_ggml_weights(CFG, rng)
    out = {_to_gguf_name(n): v for n, v in tensors.items()}

    md = dict(_metadata(CFG.n_vocab))
    md["tokenizer.ggml.model"] = "gpt2"  # no tokenizer.ggml.merges
    path = tmp_path / "bpe.gguf"
    write_gguf(path, md, out)
    f = GGUFFile(path)  # vocab-level parse succeeds
    with pytest.raises(ValueError, match="merges"):
        f.build_tokenizer()
    f.close()

    md = dict(_metadata(CFG.n_vocab))
    md["tokenizer.ggml.model"] = "bert"
    path2 = tmp_path / "unk.gguf"
    write_gguf(path2, md, out)
    with pytest.raises(ValueError, match="tokenizer model"):
        GGUFFile(path2)
