"""Byte-level BPE tokenizer (gpt2 GGUF vocabs, tokenizer_bpe.py).

The key test cross-checks against an independent implementation:
transformers' pure-Python GPT2Tokenizer consumes the SAME vocab.json /
merges.txt we feed BpeTokenizer, and both must produce identical ids on
a corpus covering unicode, contractions, digits, whitespace runs and
emoji.  The reference has no BPE tokenizer at all (SPM only,
/root/reference/th-llama.cpp:910-1108); the independent oracle stands in
for llama.cpp's gpt2 path.
"""

import json
from collections import Counter

import pytest

from tokenhawk_tpu.tokenizer_bpe import (
    CONTROL,
    NORMAL,
    BpeTokenizer,
    bytes_to_unicode,
    unicode_to_bytes,
)

CORPUS = [
    "Hello, world!",
    "The quick brown fox jumps over the lazy dog.",
    "I'll say he's done it, they're sure, we've won, you'd know.",
    "I'LL SAY HE'S DONE IT",  # case-insensitive contractions (llama-bpe)
    "x = 1234567890 + 3.14159;",
    "  leading and   internal   spaces  ",
    "line one\nline two\r\n\r\n\ttabbed",
    "naïve café — déjà vu überholt",
    "日本語のテキストと漢字",
    "emoji: 🚀🧪✨ and ½ fractions",
    "mixed: abc123def456 foo_bar-baz@example.com",
    "quotes \"double\" and 'single' and `back`",
    "",
    " ",
    "\n",
    "a",
]


def _train_merges(texts, n_merges=120):
    """Tiny deterministic BPE trainer: produces a consistent
    (vocab.json, merges.txt) pair in byte-level-unicode space that both
    implementations consume."""
    enc = bytes_to_unicode()
    words = []
    for t in texts:
        for w in t.split(" "):
            if w:
                words.append([enc[b] for b in (" " + w).encode("utf-8")])
    merges = []
    tokens = [enc[b] for b in range(256)]
    for _ in range(n_merges):
        pairs = Counter()
        for w in words:
            for a, b in zip(w, w[1:]):
                pairs[(a, b)] += 1
        if not pairs:
            break
        # Deterministic: max count, ties broken lexicographically.
        (a, b), cnt = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append(f"{a} {b}")
        tokens.append(a + b)
        merged = a + b
        for w in words:
            i = 0
            while i < len(w) - 1:
                if w[i] == a and w[i + 1] == b:
                    w[i : i + 2] = [merged]
                else:
                    i += 1
    return tokens, merges


@pytest.fixture(scope="module")
def trained():
    tokens, merges = _train_merges(CORPUS)
    tokens = tokens + ["<|endoftext|>"]
    return tokens, merges


def test_byte_table_bijective():
    enc = bytes_to_unicode()
    dec = unicode_to_bytes()
    assert len(enc) == 256 and len(dec) == 256
    for b in range(256):
        assert dec[enc[b]] == b
    # Printable ASCII maps to itself.
    assert enc[ord("A")] == "A"
    assert enc[ord(" ")] == "Ġ"  # Ġ


def test_cross_check_vs_transformers_gpt2(tmp_path, trained):
    tokens, merges = trained
    vocab_file = tmp_path / "vocab.json"
    merges_file = tmp_path / "merges.txt"
    vocab_file.write_text(
        json.dumps({t: i for i, t in enumerate(tokens)}, ensure_ascii=False))
    merges_file.write_text("#version: 0.2\n" + "\n".join(merges) + "\n")

    from transformers import GPT2Tokenizer

    oracle = GPT2Tokenizer(str(vocab_file), str(merges_file))
    ours = BpeTokenizer(tokens, merges, pre="gpt-2")

    for text in CORPUS:
        want = oracle.encode(text)
        got = ours.encode(text, add_bos=False, parse_special=False)
        assert got == want, (text, got, want)
        # decode round-trips the exact text (byte-level BPE is lossless)
        assert ours.decode(got) == text


def test_decode_token_bytes_roundtrip(trained):
    tokens, merges = trained
    ours = BpeTokenizer(tokens, merges, pre="gpt-2")
    text = "Hello naïve 🚀 world"
    ids = ours.encode(text, add_bos=False)
    assert b"".join(ours.decode_token_bytes(i) for i in ids).decode() == text


def test_llama3_pretokenizer_splits(trained):
    tokens, merges = trained
    tok = BpeTokenizer(tokens, merges, pre="llama-bpe")
    splits = [m.group() for m in tok._pre_re.finditer("In 2026 I'LL pay 1234567!")]
    # digits group in runs of <= 3 (llama-3 rule), contractions match
    # case-insensitively, punctuation takes its leading space.
    assert "202" in splits and "6" in splits
    assert "123" in splits and "456" in splits and "7" in splits
    assert "'LL" in splits
    assert splits[0] == "In"
    # gpt-2 splitting differs: digits stay in one run, 'LL does not match
    g2 = BpeTokenizer(tokens, merges, pre="gpt-2")
    g2_splits = [m.group() for m in g2._pre_re.finditer("In 2026 I'LL pay 1234567!")]
    assert " 1234567" in g2_splits
    assert "'LL" not in g2_splits


def test_special_tokens_and_ids(trained):
    tokens, merges = trained
    tokens = tokens + ["<|begin_of_text|>", "<|eot_id|>"]
    types = [NORMAL] * (len(tokens) - 2) + [CONTROL, CONTROL]
    bos, eot = len(tokens) - 2, len(tokens) - 1
    tok = BpeTokenizer(tokens, merges, token_types=types, pre="llama-bpe",
                       bos_id=bos, eos_id=eot, add_bos=True)
    ids = tok.encode("<|begin_of_text|>Hello<|eot_id|>", add_bos=False)
    assert ids[0] == bos and ids[-1] == eot
    assert bos not in ids[1:-1] and eot not in ids[1:-1]
    # add_bos prepends the metadata BOS
    ids2 = tok.encode("Hello")
    assert ids2[0] == bos
    # control tokens render as nothing; the text round-trips
    assert tok.decode(ids) == "Hello"
    assert tok.decode_token_bytes(eot) == b""
    assert eot in tok.eog_ids and tok.eos_id == eot
    # parse_special=False treats the marker as text
    ids3 = tok.encode("<|eot_id|>", add_bos=False, parse_special=False)
    assert eot not in ids3 and len(ids3) > 1


def test_add_bos_metadata_gate(trained):
    tokens, merges = trained
    tok = BpeTokenizer(tokens, merges, pre="gpt-2", bos_id=0, add_bos=False)
    assert tok.encode("hi")[0] != 0 or tok.encode("hi") == tok.encode(
        "hi", add_bos=False)


def test_missing_merges_rejected(trained):
    tokens, _ = trained
    with pytest.raises(ValueError):
        BpeTokenizer(tokens, [])


def test_gguf_gpt2_vocab_and_tokenizer(tmp_path, trained):
    """A gpt2-tokenizer GGUF loads end-to-end: build_tokenizer returns a
    BpeTokenizer with the file's bos/eos; the byte-decoded Vocab has the
    right size; encode/decode round-trips."""
    import numpy as np

    from helpers import make_ggml_weights
    from tokenhawk_tpu.config import LlamaConfig
    from tokenhawk_tpu.ggml.gguf import GGUFFile, write_gguf

    tokens, merges = trained
    tokens = tokens + ["<|begin_of_text|>", "<|end_of_text|>"]
    types = [NORMAL] * (len(tokens) - 2) + [CONTROL, CONTROL]
    n_vocab = len(tokens)
    cfg = LlamaConfig.tiny(n_vocab=n_vocab, n_embd=64, n_head=2, n_layer=2,
                           n_ff=128)
    weights = make_ggml_weights(cfg, np.random.default_rng(7))

    name_map = {
        "tok_embeddings.weight": "token_embd.weight",
        "norm.weight": "output_norm.weight",
        "output.weight": "output.weight",
    }
    for i in range(cfg.n_layer):
        for a, b in [("attention.wq", "attn_q"), ("attention.wk", "attn_k"),
                     ("attention.wv", "attn_v"), ("attention.wo", "attn_output"),
                     ("attention_norm", "attn_norm"), ("ffn_norm", "ffn_norm"),
                     ("feed_forward.w1", "ffn_gate"),
                     ("feed_forward.w2", "ffn_down"),
                     ("feed_forward.w3", "ffn_up")]:
            name_map[f"layers.{i}.{a}.weight"] = f"blk.{i}.{b}.weight"

    md = {
        "general.architecture": "llama",
        "llama.embedding_length": cfg.n_embd,
        "llama.block_count": cfg.n_layer,
        "llama.attention.head_count": cfg.n_head,
        "llama.feed_forward_length": cfg.n_ff,
        "llama.rope.dimension_count": cfg.head_dim,
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.pre": "llama-bpe",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.token_type": types,
        "tokenizer.ggml.merges": merges,
        "tokenizer.ggml.bos_token_id": n_vocab - 2,
        "tokenizer.ggml.eos_token_id": n_vocab - 1,
        "tokenizer.ggml.add_bos_token": True,
    }
    path = tmp_path / "gpt2tok.gguf"
    write_gguf(path, md, {name_map[k]: v for k, v in weights.items()})

    with GGUFFile(path) as f:
        assert len(f.vocab) == n_vocab
        tok = f.build_tokenizer()
    assert isinstance(tok, BpeTokenizer)
    assert tok.bos_id == n_vocab - 2 and tok.eos_id == n_vocab - 1
    ids = tok.encode_prompt("Hello, world!")
    assert ids[0] == tok.bos_id
    assert tok.decode(ids) == "Hello, world!"


def test_gguf_gpt2_generates(tmp_path, trained):
    """Engine end-to-end over a gpt2-tokenizer GGUF (loader dispatch +
    eos plumbing)."""
    import numpy as np

    from helpers import make_ggml_weights
    from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
    from tokenhawk_tpu.ggml.gguf import write_gguf
    from tokenhawk_tpu.runtime.engine import Engine
    from tokenhawk_tpu.runtime.loader import load_model

    tokens, merges = trained
    tokens = tokens + ["<|begin_of_text|>", "<|end_of_text|>"]
    types = [NORMAL] * (len(tokens) - 2) + [CONTROL, CONTROL]
    n_vocab = len(tokens)
    cfg = LlamaConfig.tiny(n_vocab=n_vocab, n_embd=64, n_head=2, n_layer=2,
                           n_ff=128)
    weights = make_ggml_weights(cfg, np.random.default_rng(7))
    name_map = {
        "tok_embeddings.weight": "token_embd.weight",
        "norm.weight": "output_norm.weight",
        "output.weight": "output.weight",
    }
    for i in range(cfg.n_layer):
        for a, b in [("attention.wq", "attn_q"), ("attention.wk", "attn_k"),
                     ("attention.wv", "attn_v"), ("attention.wo", "attn_output"),
                     ("attention_norm", "attn_norm"), ("ffn_norm", "ffn_norm"),
                     ("feed_forward.w1", "ffn_gate"),
                     ("feed_forward.w2", "ffn_down"),
                     ("feed_forward.w3", "ffn_up")]:
            name_map[f"layers.{i}.{a}.weight"] = f"blk.{i}.{b}.weight"
    md = {
        "general.architecture": "llama",
        "llama.embedding_length": cfg.n_embd,
        "llama.block_count": cfg.n_layer,
        "llama.attention.head_count": cfg.n_head,
        "llama.feed_forward_length": cfg.n_ff,
        "llama.rope.dimension_count": cfg.head_dim,
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.token_type": types,
        "tokenizer.ggml.merges": merges,
        "tokenizer.ggml.bos_token_id": n_vocab - 2,
        "tokenizer.ggml.eos_token_id": n_vocab - 1,
    }
    path = tmp_path / "m.gguf"
    write_gguf(path, md, {name_map[k]: v for k, v in weights.items()})

    lcfg, params, tok = load_model(path, n_ctx=64)
    assert isinstance(tok, BpeTokenizer)
    eng = Engine(lcfg, params, tokenizer=tok,
                 sampling=SamplingConfig(temperature=0.0), max_seq=64)
    assert eng.eos_id == tok.eos_id  # engine picked up the file's EOS
    res = eng.generate("Hello", max_new_tokens=4)
    assert 1 <= len(res.tokens) <= 4
