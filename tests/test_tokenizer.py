import numpy as np

from tokenhawk_tpu.tokenizer import BOS_ID, EOS_ID, Tokenizer, byte_fallback_vocab


def make_vocab():
    # Specials + byte-ish chars + merge targets with scores.
    tokens = [b"<unk>", b"<s>", b"</s>"]
    scores = [0.0, 0.0, 0.0]
    for b in range(256):
        tokens.append(bytes([b]))
        scores.append(-1e6)
    merges = {
        b"he": -1.0,
        b"ll": -2.0,
        b"llo": -1.5,
        b"hello": -0.5,
        b"hell": -3.0,
        b" world": -0.7,
        b" w": -4.0,
        b" wo": -4.1,
        b" wor": -4.2,
        b" worl": -4.3,
    }
    for t, s in merges.items():
        tokens.append(t)
        scores.append(s)
    return Tokenizer(tokens, scores)


def test_bos():
    tok = make_vocab()
    assert tok.encode("", add_bos=True) == [BOS_ID]
    assert tok.encode("", add_bos=False) == []
    ids = tok.encode("h", add_bos=True)
    assert ids[0] == BOS_ID


def test_greedy_merge_prefers_best_score():
    tok = make_vocab()
    ids = tok.encode("hello", add_bos=False)
    # "he"(-1.0) merges first, then "llo"... final full merge to "hello"(-0.5)
    assert [tok.id_to_token[i] for i in ids] == [b"hello"]


def test_multi_token_output():
    tok = make_vocab()
    ids = tok.encode("hello world", add_bos=False)
    assert [tok.id_to_token[i] for i in ids] == [b"hello", b" world"]


def test_byte_fallback_for_unknown_bytes():
    # Vocab without byte tokens: everything falls back to byte ids (+3).
    tok = Tokenizer([b"<unk>", b"<s>", b"</s>"], [0.0, 0.0, 0.0])
    ids = tok.encode("AB", add_bos=False)
    assert ids == [ord("A") + 3, ord("B") + 3]


def test_utf8_multibyte_chars_kept_whole():
    tok = byte_fallback_vocab({"é": -1.0})
    ids = tok.encode("é", add_bos=False)
    assert len(ids) == 1
    assert tok.id_to_token[ids[0]] == "é".encode("utf-8")


def test_roundtrip_decode():
    tok = make_vocab()
    text = "hello world"
    ids = tok.encode(text, add_bos=True)
    assert tok.decode(ids) == text


def test_leftmost_tie_break():
    # Two possible merges with equal score: leftmost wins.
    tokens = [b"<unk>", b"<s>", b"</s>", b"a", b"b", b"c", b"ab", b"bc"]
    scores = [0.0, 0.0, 0.0, -9.0, -9.0, -9.0, -1.0, -1.0]
    tok = Tokenizer(tokens, scores)
    ids = tok.encode("abc", add_bos=False)
    assert [tok.id_to_token[i] for i in ids] == [b"ab", b"c"]


def test_decode_byte_fallback_pieces():
    tok = Tokenizer([b"<unk>", b"<s>", b"</s>", b"<0x0A>", b"<0x41>"],
                    [0.0] * 5)
    assert tok.decode_token_bytes(3) == b"\n"
    assert tok.decode_token_bytes(4) == b"A"


def test_decode_sentencepiece_marker():
    # "▁Hello" (U+2581 prefix) decodes with a leading space.
    tok = Tokenizer([b"<unk>", b"<s>", b"</s>", "▁Hello".encode("utf-8")],
                    [0.0] * 4)
    assert tok.decode_token_bytes(3) == b" Hello"
