"""Tokenizer (reference: src/pygpukit/llm/tokenizer.py:22 wrapping the Rust
BPE at rust/llm/tokenizer.rs:74).

Primary path: the HF ``tokenizers`` runtime (present in this image) over
tokenizer.json. Fallback: a self-contained byte-level BPE implementation of
the same file format, so the package works without the dependency (and
mirrors the reference's own-BPE capability).
"""

from __future__ import annotations

import json
from pathlib import Path


class Tokenizer:
    def __init__(self, path: str):
        p = Path(path)
        if p.is_dir():
            p = p / "tokenizer.json"
        self.path = str(p)
        self._hf = None
        self._bpe = None
        try:
            from tokenizers import Tokenizer as HFTokenizer
            self._hf = HFTokenizer.from_file(self.path)
        except Exception:
            self._bpe = _ByteLevelBPE(self.path)

    def encode(self, text: str) -> list[int]:
        if self._hf is not None:
            return self._hf.encode(text).ids
        return self._bpe.encode(text)

    def decode(self, ids: list[int]) -> str:
        if self._hf is not None:
            return self._hf.decode(ids, skip_special_tokens=False)
        return self._bpe.decode(ids)

    @property
    def vocab_size(self) -> int:
        if self._hf is not None:
            return self._hf.get_vocab_size()
        return len(self._bpe.vocab)

    def token_to_id(self, token: str) -> int | None:
        if self._hf is not None:
            return self._hf.token_to_id(token)
        return self._bpe.vocab.get(token)


# byte-level BPE unicode mapping (GPT-2 convention)
def _bytes_to_unicode() -> dict[int, str]:
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


class _ByteLevelBPE:
    """Minimal byte-level BPE over tokenizer.json vocab+merges."""

    def __init__(self, path: str):
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
        model = data["model"]
        self.vocab: dict[str, int] = model["vocab"]
        self.inv_vocab = {v: k for k, v in self.vocab.items()}
        merges = model.get("merges", [])
        self.merge_ranks: dict[tuple[str, str], int] = {}
        for i, m in enumerate(merges):
            pair = tuple(m.split(" ")) if isinstance(m, str) else tuple(m)
            self.merge_ranks[pair] = i
        self.byte_enc = _bytes_to_unicode()
        self.byte_dec = {v: k for k, v in self.byte_enc.items()}
        self.added = {t["content"]: t["id"] for t in data.get("added_tokens", [])}

    def _bpe_word(self, word: str) -> list[str]:
        parts = list(word)
        while len(parts) > 1:
            best, best_rank = None, None
            for i in range(len(parts) - 1):
                r = self.merge_ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            parts = (parts[:best] + [parts[best] + parts[best + 1]]
                     + parts[best + 2:])
        return parts

    def encode(self, text: str) -> list[int]:
        # split out added/special tokens first
        segments = [text]
        for tok in sorted(self.added, key=len, reverse=True):
            new_segments = []
            for seg in segments:
                if isinstance(seg, int):
                    new_segments.append(seg)
                    continue
                while tok in seg:
                    pre, _, seg = seg.partition(tok)
                    if pre:
                        new_segments.append(pre)
                    new_segments.append(self.added[tok])
                if seg:
                    new_segments.append(seg)
            segments = new_segments
        ids: list[int] = []
        for seg in segments:
            if isinstance(seg, int):
                ids.append(seg)
                continue
            mapped = "".join(self.byte_enc[b] for b in seg.encode("utf-8"))
            # simple whitespace-aware chunking (GPT-2 regex approximation)
            for word in _split_words(mapped):
                for piece in self._bpe_word(word):
                    if piece in self.vocab:
                        ids.append(self.vocab[piece])
        return ids

    def decode(self, ids: list[int]) -> str:
        inv_added = {v: k for k, v in self.added.items()}
        out = []
        for i in ids:
            if i in inv_added:
                out.append(inv_added[i])
            elif i in self.inv_vocab:
                tok = self.inv_vocab[i]
                out.append(bytes(self.byte_dec.get(c, ord(" ")) for c in tok)
                           .decode("utf-8", errors="replace"))
        return "".join(out)


def _split_words(mapped: str) -> list[str]:
    """Split on the byte-mapped space marker 'Ġ', keeping it attached."""
    words: list[str] = []
    cur = ""
    for ch in mapped:
        if ch == "Ġ" and cur:
            words.append(cur)
            cur = ch
        else:
            cur += ch
    if cur:
        words.append(cur)
    return words
