"""Byte-level BPE tokenizer (GGUF ``tokenizer.ggml.model == "gpt2"``).

Covers the vocab family the reference never had (it is SentencePiece-only,
/root/reference/th-llama.cpp:910-1108) but that most current GGUF files
ship: Llama-3 and friends store a GPT-2-style byte-level BPE vocabulary —
every byte maps to a printable unicode char (the Radford et al. byte
table), pre-tokenization is a regex split, and merges are an explicit
ranked pair list (``tokenizer.ggml.merges``) rather than SentencePiece's
scored pieces.

Design notes:
- ``regex`` (the PyPI module, bundled with transformers) provides the
  ``\\p{L}``/``\\p{N}`` unicode properties the pre-tokenizer patterns
  need; stdlib ``re`` cannot express them.
- Special tokens (CONTROL / USER_DEFINED token types) are matched
  literally before pre-tokenization (longest-first), the behavior chat
  templates need: rendered prompts contain ``<|eot_id|>``-style markers
  that must map to their single token ids.
- The public surface mirrors ``tokenizer.Tokenizer`` (encode /
  encode_prompt / decode / decode_token_bytes / n_vocab) so engines and
  serving are tokenizer-model agnostic; ``bos_id`` / ``eos_id`` /
  ``eog_ids`` expose the file's ids (Llama-3's BOS is 128000, not the
  SPM default 1).

Cross-validated against transformers' pure-Python GPT2Tokenizer on the
same vocab/merges files (tests/test_tokenizer_bpe.py).
"""

from __future__ import annotations

import sys
from functools import lru_cache
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import regex as _re

# token_type values (tokenizer.ggml.token_type)
NORMAL = 1
UNKNOWN = 2
CONTROL = 3
USER_DEFINED = 4
UNUSED = 5
BYTE = 6

# Pre-tokenizer patterns keyed by tokenizer.ggml.pre.  Each value is the
# regex the matching llama.cpp pretokenizer applies (the pattern *is* the
# published spec of these tokenizers' behavior; see e.g. the GPT-2 vocab
# release and the Llama-3 tokenizer.json).
_GPT2_PRE = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
)
_LLAMA3_PRE = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)"
    r"|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}"
    r"| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)
_PRE_PATTERNS = {
    "default": _GPT2_PRE,
    "gpt-2": _GPT2_PRE,
    "gpt2": _GPT2_PRE,
    "llama-bpe": _LLAMA3_PRE,
    "llama3": _LLAMA3_PRE,
    "llama-v3": _LLAMA3_PRE,
    # Same pattern family as llama-bpe (digit grouping differs only in
    # vocabs that split numbers differently; these ship llama-3's rule).
    "smaug-bpe": _LLAMA3_PRE,
}


@lru_cache(maxsize=1)
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte -> printable-unicode-char table.

    Printable ASCII and the latin-1 block map to themselves; the
    remaining 68 bytes map to U+0100.. so every byte has a visible,
    unambiguous spelling inside vocab strings."""
    keep = (list(range(ord("!"), ord("~") + 1))
            + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100)))
    table: Dict[int, str] = {b: chr(b) for b in keep}
    n = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(0x100 + n)
            n += 1
    return table


@lru_cache(maxsize=1)
def unicode_to_bytes() -> Dict[str, int]:
    return {c: b for b, c in bytes_to_unicode().items()}


class BpeTokenizer:
    def __init__(
        self,
        tokens: Sequence[str],
        merges: Sequence[str],
        token_types: Optional[Sequence[int]] = None,
        pre: str = "default",
        bos_id: Optional[int] = None,
        eos_id: Optional[int] = None,
        add_bos: bool = True,
    ):
        self.id_to_token: List[str] = list(tokens)
        self.token_to_id: Dict[str, int] = {}
        for i, t in enumerate(self.id_to_token):
            self.token_to_id.setdefault(t, i)
        self.token_types = (list(token_types) if token_types is not None
                            else [NORMAL] * len(tokens))
        # merges lines are "left right" in byte-level-unicode space; rank
        # = line order (lower merges first).
        self.ranks: Dict[Tuple[str, str], int] = {}
        for i, m in enumerate(merges):
            a, sep, b = m.partition(" ")
            if not sep:
                raise ValueError(f"malformed BPE merge line {m!r}")
            self.ranks[(a, b)] = i
        if not self.ranks:
            raise ValueError("gpt2 tokenizer requires a non-empty merge table")

        pat = _PRE_PATTERNS.get(pre)
        if pat is None:
            print(f"tokenizer: unknown pre-tokenizer {pre!r}, "
                  "falling back to gpt-2 splitting", file=sys.stderr)
            pat = _GPT2_PRE
        self.pre = pre
        self._pre_re = _re.compile(pat)

        self.bos_id = bos_id if bos_id is not None else -1
        self.eos_id = eos_id if eos_id is not None else -1
        self.add_bos = add_bos

        # Specials: matched literally (longest first) before the regex
        # split.  CONTROL and USER_DEFINED types; also any <|...|> spelled
        # token if the file shipped no type array.
        self._specials: Dict[str, int] = {}
        for i, (t, ty) in enumerate(zip(self.id_to_token, self.token_types)):
            if ty in (CONTROL, USER_DEFINED):
                self._specials.setdefault(t, i)
        self._special_re = None
        if self._specials:
            alts = sorted(self._specials, key=len, reverse=True)
            self._special_re = _re.compile(
                "|".join(_re.escape(s) for s in alts))

        # End-of-generation ids: eos plus common chat terminators present
        # in the vocab (Llama-3 instruct stops on <|eot_id|>/<|eom_id|>).
        self.eog_ids = {self.eos_id} if self.eos_id >= 0 else set()
        for name in ("<|eot_id|>", "<|eom_id|>", "<|end_of_text|>",
                     "<|im_end|>", "<|end|>"):
            tid = self.token_to_id.get(name)
            if tid is not None and self.token_types[tid] == CONTROL:
                self.eog_ids.add(tid)

        self._byte_enc = bytes_to_unicode()
        self._byte_dec = unicode_to_bytes()

    @property
    def n_vocab(self) -> int:
        return len(self.id_to_token)

    # -- encoding ----------------------------------------------------------

    @lru_cache(maxsize=16384)
    def _bpe(self, word: str) -> Tuple[str, ...]:
        """Merge one pre-token (byte-level-unicode string) by rank."""
        parts: List[str] = list(word)
        while len(parts) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(parts) - 1):
                r = self.ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_i = i
            if best_rank is None:
                break
            parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
        return tuple(parts)

    def _encode_chunk(self, text: str, out: List[int]) -> None:
        for m in self._pre_re.finditer(text):
            word = "".join(self._byte_enc[b] for b in m.group().encode("utf-8"))
            for piece in self._bpe(word):
                tid = self.token_to_id.get(piece)
                if tid is not None:
                    out.append(tid)
                else:  # unreachable with a complete byte-level vocab
                    out.extend(
                        t for t in (self.token_to_id.get(c) for c in piece)
                        if t is not None)

    def encode(self, text: str, add_bos: bool = True,
               parse_special: bool = True) -> List[int]:
        """text -> ids.  ``add_bos`` is further gated by the file's
        ``tokenizer.ggml.add_bos_token`` flag.  ``parse_special`` maps
        special-token spellings in the text to their ids — chat-template
        output needs this; pass False to treat user text opaquely."""
        out: List[int] = []
        if add_bos and self.add_bos and self.bos_id >= 0:
            out.append(self.bos_id)
        if not text:
            return out
        if parse_special and self._special_re is not None:
            pos = 0
            for m in self._special_re.finditer(text):
                if m.start() > pos:
                    self._encode_chunk(text[pos : m.start()], out)
                out.append(self._specials[m.group()])
                pos = m.end()
            if pos < len(text):
                self._encode_chunk(text[pos:], out)
        else:
            self._encode_chunk(text, out)
        return out

    def encode_prompt(self, text: str, add_bos: bool = True) -> List[int]:
        """Byte-level BPE has no SentencePiece dummy-space prefix: the
        pre-tokenizer's `` ?\\p{L}+`` classes already attach a leading
        space to word pieces, so prompts encode as-is."""
        return self.encode(text, add_bos=add_bos)

    # -- decoding ----------------------------------------------------------

    def decode_token_bytes(self, token_id: int) -> bytes:
        if not (0 <= token_id < len(self.id_to_token)):
            return b""
        ty = self.token_types[token_id]
        if ty == CONTROL:
            return b""  # control markers don't render (llama.cpp parity)
        piece = self.id_to_token[token_id]
        if ty == USER_DEFINED:
            return piece.encode("utf-8")
        if ty == BYTE and piece.startswith("<0x") and piece.endswith(">"):
            return bytes([int(piece[3:-1], 16)])
        dec = self._byte_dec
        return bytes(dec.get(c, 0x3F) for c in piece)  # '?' never hit

    def decode(self, ids: Iterable[int]) -> str:
        return b"".join(
            self.decode_token_bytes(i) for i in ids
        ).decode("utf-8", errors="replace")

    # -- construction --------------------------------------------------

    @staticmethod
    def from_gguf_metadata(md: Dict) -> "BpeTokenizer":
        tokens = md["tokenizer.ggml.tokens"]
        merges = md.get("tokenizer.ggml.merges")
        if not merges:
            raise ValueError(
                "gpt2-model GGUF is missing tokenizer.ggml.merges")
        return BpeTokenizer(
            tokens,
            merges,
            token_types=md.get("tokenizer.ggml.token_type"),
            pre=md.get("tokenizer.ggml.pre", "default"),
            bos_id=md.get("tokenizer.ggml.bos_token_id"),
            eos_id=md.get("tokenizer.ggml.eos_token_id"),
            add_bos=bool(md.get("tokenizer.ggml.add_bos_token", True)),
        )
