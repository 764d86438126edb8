"""Self-contained CLIP byte-level BPE tokenizer.

The reference relies on ``transformers.CLIPTokenizer`` downloaded with the
SD-1.5 checkpoint (/root/reference/live2diff/animatediff/pipeline/
pipeline_animatediff_depth.py:268-271). This environment has no network, so
we implement the tokenizer directly: byte-level BPE with ``</w>``
end-of-word markers, lowercasing, and CLIP's special tokens. Vocab and
merges load from the standard ``tokenizer/vocab.json`` + ``merges.txt``
inside an SD checkpoint directory.
"""

from __future__ import annotations

import functools
import gzip
import html
import json
import os
import re
from typing import Dict, List, Sequence, Tuple

import numpy as np

_TOKEN_PATTERN = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
) if False else None  # \p classes need `regex`; python re fallback below

_FALLBACK_PATTERN = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""",
    re.IGNORECASE,
)


@functools.lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2 style reversible byte<->unicode mapping."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class CLIPTokenizer:
    """CLIP BPE tokenizer (49408 tokens, 77-token context for SD-1.5)."""

    def __init__(self, vocab: Dict[str, int], merges: List[Tuple[str, str]],
                 model_max_length: int = 77):
        self.encoder = vocab
        self.decoder = {v: k for k, v in vocab.items()}
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.model_max_length = model_max_length
        self.bos_token = "<|startoftext|>"
        self.eos_token = "<|endoftext|>"
        self.bos_token_id = vocab[self.bos_token]
        self.eos_token_id = vocab[self.eos_token]
        self.pad_token_id = self.eos_token_id
        self.cache: Dict[str, str] = {
            self.bos_token: self.bos_token, self.eos_token: self.eos_token
        }
        # textual-inversion / user-added tokens, matched before BPE
        self.added_tokens: Dict[str, int] = {}

    # -- construction -------------------------------------------------------

    @classmethod
    def from_pretrained(cls, path: str, **kwargs) -> "CLIPTokenizer":
        """Load from an SD checkpoint dir (``<path>/vocab.json``/``merges.txt``
        or ``<path>/tokenizer/...``)."""
        for sub in ("", "tokenizer"):
            vpath = os.path.join(path, sub, "vocab.json")
            mpath = os.path.join(path, sub, "merges.txt")
            if os.path.isfile(vpath) and os.path.isfile(mpath):
                with open(vpath, encoding="utf-8") as f:
                    vocab = json.load(f)
                with open(mpath, encoding="utf-8") as f:
                    lines = f.read().split("\n")
                merges = [tuple(l.split()) for l in lines if l and not l.startswith("#version")]
                merges = [m for m in merges if len(m) == 2]
                return cls(vocab, merges, **kwargs)
        raise FileNotFoundError(f"no vocab.json/merges.txt under {path}")

    @classmethod
    def tiny(cls, model_max_length: int = 16) -> "CLIPTokenizer":
        """A minimal synthetic vocab for tests (byte alphabet, no merges)."""
        byte_vocab = list(bytes_to_unicode().values())
        vocab = {c: i for i, c in enumerate(byte_vocab)}
        n = len(vocab)
        for i, c in enumerate(byte_vocab):
            vocab[c + "</w>"] = n + i
        vocab["<|startoftext|>"] = len(vocab)
        vocab["<|endoftext|>"] = len(vocab)
        return cls(vocab, [], model_max_length=model_max_length)

    # -- BPE ----------------------------------------------------------------

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = set(zip(word[:-1], word[1:]))
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = set(zip(word[:-1], word[1:]))
        out = " ".join(word)
        self.cache[token] = out
        return out

    def add_token(self, token: str, token_id: int) -> None:
        """Register an atomic (textual-inversion) token."""
        self.added_tokens[token] = token_id
        self.encoder[token] = token_id
        self.decoder[token_id] = token

    def tokenize(self, text: str) -> List[int]:
        text = whitespace_clean(html.unescape(html.unescape(text))).lower()
        ids: List[int] = []
        # split on added tokens first so they stay atomic
        segments = [text]
        for tok in sorted(self.added_tokens, key=len, reverse=True):
            new_segments: List = []
            for seg in segments:
                if isinstance(seg, int):
                    new_segments.append(seg)
                    continue
                parts = seg.split(tok.lower())
                for i, part in enumerate(parts):
                    if i:
                        new_segments.append(self.added_tokens[tok])
                    if part:
                        new_segments.append(part)
            segments = new_segments
        for seg in segments:
            if isinstance(seg, int):
                ids.append(seg)
                continue
            for token in _FALLBACK_PATTERN.findall(seg):
                token_bytes = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
                for bpe_token in self._bpe(token_bytes).split(" "):
                    ids.append(self.encoder.get(bpe_token, self.eos_token_id))
        return ids

    # -- public API ---------------------------------------------------------

    def __call__(
        self,
        texts: Sequence[str] | str,
        padding: str = "max_length",
        max_length: int | None = None,
        truncation: bool = True,
    ) -> np.ndarray:
        """Encode to ``[batch, max_length]`` int32 ids with BOS/EOS/pad."""
        if isinstance(texts, str):
            texts = [texts]
        max_length = max_length or self.model_max_length
        out = np.full((len(texts), max_length), self.pad_token_id, dtype=np.int32)
        for row, text in enumerate(texts):
            ids = [self.bos_token_id] + self.tokenize(text)
            ids = ids[: max_length - 1] + [self.eos_token_id]
            out[row, : len(ids)] = ids
        return out

    def decode(self, ids: Sequence[int]) -> str:
        text = "".join(
            self.decoder.get(int(i), "") for i in ids
            if int(i) not in (self.bos_token_id, self.eos_token_id)
        )
        raw = bytearray(self.byte_decoder.get(c, 32) for c in text.replace("</w>", " "))
        return raw.decode("utf-8", errors="replace").strip()
