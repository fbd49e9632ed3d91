"""Checkpoint-vocabulary tokenizers — the published CLIP BPE.

The framework-native :class:`.text_encoder.ByteTokenizer` needs no assets,
but IMPORTED checkpoints were trained against their own vocabularies: ids
must come from the checkpoint's ``vocab.json`` + ``merges.txt`` or the
prompt means something else.  This implements the published CLIP byte-pair
encoding (openai/CLIP ``simple_tokenizer``; what ``transformers.
CLIPTokenizer`` reimplements): byte-to-unicode remapping, the
contraction/letter/number/punctuation split regex, lowest-rank merge
loops, and the ``</w>`` end-of-word marker.

Text cleaning follows the original release: whitespace collapse +
lowercase.  (The original also runs ftfy mojibake fixing when available;
HF falls back to a BERT BasicTokenizer that additionally strips accents —
for ASCII prompts all three agree, and the parity test pins ours to
transformers on a shared synthetic vocabulary.)

T5 checkpoints use SentencePiece, whose model file is a protobuf — load
ids with any SentencePiece implementation; this module covers the CLIP
towers (SD1.5 / SDXL / SD3 / Flux all use CLIP BPE for their CLIP text
encoders).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import regex  # the published pattern needs \p{L}/\p{N} classes

_PATTERN = regex.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    regex.IGNORECASE,
)


def _bytes_to_unicode() -> dict[int, str]:
    "The published reversible byte <-> printable-unicode table."
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(ord("¡"), ord("¬") + 1)) + list(range(ord("®"), ord("ÿ") + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


class CLIPBPETokenizer:
    """CLIP byte-pair encoder over a checkpoint's ``vocab.json`` +
    ``merges.txt``.  ``__call__`` produces the diffusers-pipeline id layout:
    ``bos + tokens + eos``, truncated to ``length``, padded with ``pad_id``
    (CLIP-L convention: the eos id; SDXL's second tokenizer pads with 0 —
    pass ``pad_id=0``)."""

    BOS = "<|startoftext|>"
    EOS = "<|endoftext|>"

    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]], max_tokens: int = 77):
        self.vocab = dict(vocab)
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.max_tokens = max_tokens
        self.byte_encoder = _bytes_to_unicode()
        self.id_to_token = {i: t for t, i in self.vocab.items()}
        self._cache: dict[str, tuple[str, ...]] = {}
        for special in (self.BOS, self.EOS):
            if special not in self.vocab:
                raise ValueError(f"vocabulary is missing {special!r}")
        self.bos_id = self.vocab[self.BOS]
        self.eos_id = self.vocab[self.EOS]

    @classmethod
    def from_files(cls, vocab_json: str | Path, merges_txt: str | Path, **kw) -> "CLIPBPETokenizer":
        vocab = json.loads(Path(vocab_json).read_text(encoding="utf-8"))
        merges = []
        for line in Path(merges_txt).read_text(encoding="utf-8").splitlines():
            if line.startswith("#version") or not line.strip():
                continue
            a, b = line.split()
            merges.append((a, b))
        return cls(vocab, merges, **kw)

    def _bpe(self, token: str) -> tuple[str, ...]:
        "Lowest-rank merge loop over the word, with the </w> terminal marker."
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        word = (*token[:-1], token[-1] + "</w>")
        while len(word) > 1:
            pairs = set(zip(word, word[1:]))
            bigram = min(pairs, key=lambda p: self.ranks.get(p, float("inf")))
            if bigram not in self.ranks:
                break
            first, second = bigram
            out: list[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    out.append(first + second)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = tuple(out)
        self._cache[token] = word
        return word

    def encode(self, text: str) -> list[int]:
        "Text -> BPE ids, no implicit specials.  Cleaning: whitespace collapse + lowercase."
        text = " ".join(text.split()).lower()
        ids: list[int] = []
        for token in _PATTERN.findall(text):
            if token in (self.BOS, self.EOS):
                # the regex matches literal special-token text; it stays one
                # atomic id (the published cache pre-seeds these), never BPE'd
                ids.append(self.vocab[token])
                continue
            mapped = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            for piece in self._bpe(mapped):
                ids.append(self.vocab[piece])
        return ids

    def decode(self, ids) -> str:
        byte_decoder = {c: b for b, c in self.byte_encoder.items()}
        text = "".join(self.id_to_token[int(i)] for i in np.asarray(ids).reshape(-1))
        raw = bytes(byte_decoder[c] for c in text if c in byte_decoder)
        # the </w> markers are plain ascii and survive the byte decode;
        # word boundaries become spaces only after it
        return raw.decode("utf-8", errors="replace").replace("</w>", " ").strip()

    def __call__(self, texts: str | list[str], length: int | None = None, pad_id: int | None = None) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        length = length or self.max_tokens
        pad = self.eos_id if pad_id is None else pad_id
        rows = []
        for text in texts:
            ids = [self.bos_id, *self.encode(text)[: length - 2], self.eos_id]
            rows.append(ids + [pad] * (length - len(ids)))
        return np.asarray(rows, np.int32)
