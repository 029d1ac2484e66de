"""Self-contained CLIP BPE tokenizer — removes the ``transformers`` runtime dep.

The reference loads HF ``CLIPTokenizer`` from the Stable Diffusion checkpoint
directory (``/root/reference/t2v_video_sample.py:23``); this module reproduces
its token ids bit-for-bit from the same ``tokenizer/vocab.json`` +
``tokenizer/merges.txt`` assets, with zero third-party model-stack imports
(`regex` only, for the \\p{L}/\\p{N} token pattern).

Semantics replicated (verified bit-identical against the installed
transformers in tests/test_tokenizer.py):

- byte-level BPE with ``</w>`` end-of-word markers (OpenAI CLIP);
- the no-ftfy text-normalisation path HF uses in this environment: control
  char removal, whitespace folding, CJK spacing, NFC normalisation,
  whitespace-split + lowercase (accents kept, punctuation NOT split), then
  the CLIP token regex;
- merges file: first line is a version header, table truncated to the CLIP
  vocab budget (49152 - 256 - 2 merge rows);
- encode: ``<|startoftext|> X <|endoftext|>``, truncation to max_length
  keeps the head, padding uses the eos id.
"""

from __future__ import annotations

import json
import os
import unicodedata
from functools import lru_cache
from typing import Dict, List, Tuple

import numpy as np
import regex

_PAT = regex.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    regex.IGNORECASE,
)

BOS = "<|startoftext|>"
EOS = "<|endoftext|>"


@lru_cache(maxsize=1)
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2/CLIP reversible byte<->unicode table (printable ranges map to
    themselves; remaining bytes map above U+0100)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = list(bs)
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _is_whitespace(ch: str) -> bool:
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F
        or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF
        or 0x2F800 <= cp <= 0x2FA1F
    )


def _normalize(text: str) -> str:
    """HF CLIPTokenizer's no-ftfy path: BasicTokenizer(strip_accents=False,
    do_split_on_punc=False) then space-join — i.e. clean, CJK-space, NFC,
    whitespace-split, lowercase, rejoin."""
    cleaned = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or _is_control(ch):
            continue
        if _is_cjk(cp):
            cleaned.append(" " + ch + " ")
        elif _is_whitespace(ch):
            cleaned.append(" ")
        else:
            cleaned.append(ch)
    text = unicodedata.normalize("NFC", "".join(cleaned))
    return " ".join(tok.lower() for tok in text.split())


def _get_pairs(word: Tuple[str, ...]) -> set:
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


class ClipTokenizer:
    """Drop-in for the subset of HF ``CLIPTokenizer`` the runtime uses."""

    model_max_length = 77

    def __init__(self, vocab_file: str, merges_file: str):
        with open(vocab_file, encoding="utf-8") as fh:
            self.encoder: Dict[str, int] = json.load(fh)
        self.decoder = {v: k for k, v in self.encoder.items()}
        with open(merges_file, encoding="utf-8") as fh:
            lines = fh.read().strip().split("\n")[1 : 49152 - 256 - 2 + 1]
        self.bpe_ranks = {tuple(line.split()): i for i, line in enumerate(lines)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self._cache: Dict[str, str] = {BOS: BOS, EOS: EOS}
        self.bos_token_id = self.encoder[BOS]
        self.eos_token_id = self.encoder[EOS]
        self.pad_token_id = self.eos_token_id
        self.unk_token_id = self.eos_token_id

    @classmethod
    def from_pretrained(cls, model_path: str, subfolder: str = "tokenizer"):
        base = os.path.join(model_path, subfolder) if subfolder else model_path
        return cls(
            os.path.join(base, "vocab.json"), os.path.join(base, "merges.txt")
        )

    # ------------------------------------------------------------------
    def _bpe(self, token: str) -> str:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
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
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def tokenize(self, text: str) -> List[str]:
        text = _normalize(text)
        toks: List[str] = []
        for token in _PAT.findall(text):
            mapped = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            toks.extend(self._bpe(mapped).split(" "))
        return toks

    def convert_tokens_to_ids(self, tokens: List[str]) -> List[int]:
        return [self.encoder.get(t, self.unk_token_id) for t in tokens]

    def encode(self, text: str, max_length: int = 77) -> List[int]:
        """bos + bpe ids + eos, head-truncated to ``max_length`` (HF
        'longest_first' truncation with 2 special tokens)."""
        ids = self.convert_tokens_to_ids(self.tokenize(text))
        ids = ids[: max_length - 2]
        return [self.bos_token_id] + ids + [self.eos_token_id]

    def encode_padded(self, text: str, max_length: int = 77) -> np.ndarray:
        """(1, max_length) int32 ids, eos-padded — matches
        ``hf_tok(text, padding='max_length', truncation=True).input_ids``."""
        ids = self.encode(text, max_length=max_length)
        ids = ids + [self.pad_token_id] * (max_length - len(ids))
        return np.asarray([ids], dtype=np.int32)

    def decode(self, ids) -> str:
        toks = [self.decoder.get(int(i), EOS) for i in ids]
        text = "".join(t for t in toks if t not in (BOS, EOS))
        data = bytearray(self.byte_decoder[c] for c in text)
        return data.decode("utf-8", errors="replace").replace("</w>", " ").strip()
