"""CLIP byte-pair-encoding tokenizer (host-side, pure Python).

Implements the standard CLIP ``SimpleTokenizer`` algorithm (reference
model/tokenizer.py:74-186) against the public
``bpe_simple_vocab_16e6.txt.gz`` merge table: byte-to-unicode remapping,
lowercasing + whitespace normalization, regex word splitting, greedy
lowest-rank pair merging with an end-of-word marker, and fixed-length
[N, 77] int32 sequences wrapped in SOT/EOT.

``ftfy`` text fixing is applied when the library is present (it is a no-op
for the ASCII prompt set this framework ships).
"""

from __future__ import annotations

import functools
import gzip
import html
import os
from typing import Iterable, List, Union

import numpy as np

try:  # optional dependency; identity for ASCII input
    import ftfy

    def _fix_text(s: str) -> str:
        return ftfy.fix_text(s)
except ImportError:  # pragma: no cover
    def _fix_text(s: str) -> str:
        return s

try:
    import regex as _re
except ImportError:  # pragma: no cover
    import re as _re

VOCAB_PATH = os.path.join(os.path.dirname(__file__), "bpe_simple_vocab_16e6.txt.gz")
CONTEXT_LENGTH = 77

_WORD_PATTERN = (
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
    r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
)


@functools.lru_cache()
def _byte_unicode_table() -> dict:
    """Reversible byte -> printable-unicode mapping used by GPT-2-style BPE."""
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    table = {b: chr(b) for b in keep}
    shift = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + shift)
            shift += 1
    return table


class ClipTokenizer:
    def __init__(self, vocab_path: str = VOCAB_PATH):
        self._byte_enc = _byte_unicode_table()
        self._byte_dec = {v: k for k, v in self._byte_enc.items()}

        with gzip.open(vocab_path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        # header line, then exactly 49152-256-2 merge rules
        merges = [tuple(line.split()) for line in lines[1 : 49152 - 256 - 2 + 1]]
        self._ranks = {pair: i for i, pair in enumerate(merges)}

        base = list(self._byte_enc.values())
        vocab = base + [c + "</w>" for c in base]
        vocab += ["".join(pair) for pair in merges]
        vocab += ["<|startoftext|>", "<|endoftext|>"]
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.sot_token = self.encoder["<|startoftext|>"]
        self.eot_token = self.encoder["<|endoftext|>"]
        self.vocab_size = len(vocab)

        try:
            self._word_re = _re.compile(_WORD_PATTERN, _re.IGNORECASE)
        except Exception as e:  # pragma: no cover — stdlib `re` fallback
            raise ImportError(
                "CLIP BPE tokenization requires the 'regex' package: the "
                "stdlib 're' module cannot compile the unicode "
                "\\p{L}/\\p{N} word pattern") from e
        # special tokens pass through BPE unsplit (the reference tokenizer
        # pre-seeds its cache the same way, model/tokenizer.py:87); the
        # cache key is the byte-encoded word, which for these pure-ASCII
        # literals is the literal itself
        self._cache: dict = {tok: [tok]
                             for tok in ("<|startoftext|>", "<|endoftext|>")}

    # -- core BPE -----------------------------------------------------------

    def _merge_word(self, token: str) -> List[str]:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        parts = list(token[:-1]) + [token[-1] + "</w>"]
        while len(parts) > 1:
            best_rank = None
            best_idx = -1
            for i in range(len(parts) - 1):
                rank = self._ranks.get((parts[i], parts[i + 1]))
                if rank is not None and (best_rank is None or rank < best_rank):
                    best_rank, best_idx = rank, i
            if best_rank is None:
                break
            merged = parts[best_idx] + parts[best_idx + 1]
            # merge every (non-overlapping) occurrence of the chosen pair
            out: List[str] = []
            i = 0
            while i < len(parts):
                if (
                    i < len(parts) - 1
                    and parts[i] == parts[best_idx]
                    and parts[i + 1] == parts[best_idx + 1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            parts = out
        self._cache[token] = parts
        return parts

    @staticmethod
    def _clean(text: str) -> str:
        text = _fix_text(text)
        text = html.unescape(html.unescape(text))
        text = _re.sub(r"\s+", " ", text.strip())
        return text.strip().lower()

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for word in self._word_re.findall(self._clean(text)):
            mapped = "".join(self._byte_enc[b] for b in word.encode("utf-8"))
            ids.extend(self.encoder[p] for p in self._merge_word(mapped))
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        text = "".join(self.decoder[i] for i in ids)
        raw = bytearray(self._byte_dec[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")


@functools.lru_cache()
def default_tokenizer() -> ClipTokenizer:
    return ClipTokenizer()


def tokenize(
    texts: Union[str, List[str]],
    context_length: int = CONTEXT_LENGTH,
    truncate: bool = False,
) -> np.ndarray:
    """Tokenize to a zero-padded [N, context_length] int32 array with
    SOT/EOT wrapping (reference model/tokenizer.py:150-186)."""
    if isinstance(texts, str):
        texts = [texts]
    tok = default_tokenizer()
    out = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        ids = [tok.sot_token] + tok.encode(text) + [tok.eot_token]
        if len(ids) > context_length:
            if not truncate:
                raise RuntimeError(
                    f"Input {text!r} is too long for context length {context_length}"
                )
            ids = ids[:context_length]
            ids[-1] = tok.eot_token
        out[i, : len(ids)] = ids
    return out
