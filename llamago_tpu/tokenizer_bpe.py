"""Byte-level BPE tokenizer (GPT-2 family — LLaMA-3 GGUF/HF models).

The reference implements only the sentencepiece-scored tokenizer
(pkg/ml/ml.go:2648-2848 — see tokenizer.py); LLaMA-3-era checkpoints
use byte-level BPE instead: text is pre-split by a regex, each pre-token
is mapped through GPT-2's printable-byte bijection, and adjacent pieces
merge by LOWEST merge-rank (training order) rather than by vocab score.

This is a from-scratch implementation (the `regex` module supplies the
\\p{L}/\\p{N} classes Python's `re` lacks); the HF `tokenizers` library
is used in the test suite as an external oracle only
(tests/test_tokenizer_bpe.py).

Pre-tokenizer patterns:
  * gpt2      — the original GPT-2 split (also HF ByteLevel's default)
  * llama-bpe — LLaMA-3's variant (case-insensitive contractions,
                1-3 digit number groups, newline handling)

The engine/CLI interface stays `tokenize(vocab, ...)`/`detokenize` —
tokenizer.py dispatches on the vocab type — and BPE vocabs carry their
own bos/eos ids and want no leading-space normalization
(`space_prefix = False`).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

GPT2_PATTERN = (
    r"""'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"""
    r"""|\s+(?!\S)|\s+"""
)
LLAMA3_PATTERN = (
    r"""(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}"""
    r"""| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"""
)
PATTERNS = {"gpt2": GPT2_PATTERN, "llama-bpe": LLAMA3_PATTERN,
            "default": GPT2_PATTERN}
_GGUF_TOK_CONTROL = 3  # tokenizer.ggml.token_type control/special code


@functools.lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's bijection from bytes to printable unicode chars (so BPE
    vocab files stay readable): printable latin-1 maps to itself, the
    rest to 256+n."""
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


@functools.lru_cache(maxsize=1)
def unicode_to_bytes() -> dict[str, int]:
    return {c: b for b, c in bytes_to_unicode().items()}


@dataclass
class BPEVocab:
    """tokens[i] = piece string in byte-unicode space; merges rank pairs
    by training order (lower = earlier = higher priority)."""

    tokens: list[str]
    merges: dict[tuple[str, str], int]
    bos_id: int = 0
    eos_id: int = 1
    pattern: str = "gpt2"
    # ids of control/special tokens (<|begin_of_text|> etc.) — skipped by
    # decode so stop_at_eos generations don't render markup into text
    special_ids: frozenset = frozenset()
    space_prefix = False  # no SP leading-space normalization (engine)

    token_to_id: dict[str, int] = field(init=False)

    def __post_init__(self) -> None:
        self.token_to_id = {t: i for i, t in enumerate(self.tokens)}
        import regex

        # a known pattern NAME, or a raw regex (HF tokenizer.json carries
        # the split pattern verbatim)
        self._re = regex.compile(PATTERNS.get(self.pattern, self.pattern))
        # special-token pre-split: markup like <|start_header_id|> must map
        # to its single control id, never through byte-BPE (HF tokenizers'
        # added-token splitting; chat templates depend on it). Specials are
        # ASCII, so their piece text is identical in byte-unicode space.
        pieces = sorted((self.tokens[i] for i in self.special_ids
                         if 0 <= i < len(self.tokens) and self.tokens[i]),
                        key=len, reverse=True)
        self._special_re = (
            regex.compile("|".join(regex.escape(p) for p in pieces))
            if pieces else None)
        # ids that END a generation: eos plus the end-of-turn controls of
        # instruct fine-tunes (LLaMA-3's <|eot_id|>/<|eom_id|>). decode()
        # skips control tokens, so text stop-sequences can never see these
        # — the engine stops on the ids instead (runtime/engine.py).
        self.stop_ids = frozenset(
            {self.eos_id}
            | {self.token_to_id[n]
               for n in ("<|eot_id|>", "<|eom_id|>", "<|end_of_text|>")
               if n in self.token_to_id})

    def __len__(self) -> int:
        return len(self.tokens)

    @property
    def chat_template_hint(self) -> str | None:
        """Template family implied by the vocab's control tokens (chat
        templates are a property of the fine-tune; the header tokens only
        exist in LLaMA-3-family vocabs)."""
        if "<|start_header_id|>" in self.token_to_id:
            return "llama3"
        return None

    def _bpe(self, pieces: list[str]) -> list[str]:
        while len(pieces) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(pieces) - 1):
                r = self.merges.get((pieces[i], pieces[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_i = i
            if best_rank is None:
                break
            pieces = (pieces[:best_i]
                      + [pieces[best_i] + pieces[best_i + 1]]
                      + pieces[best_i + 2:])
        return pieces

    def encode(self, text: str, bos: bool = False) -> list[int]:
        ids: list[int] = [self.bos_id] if bos else []
        if self._special_re is None:
            self._encode_plain(text, ids)
            return ids
        pos = 0
        for m in self._special_re.finditer(text):
            self._encode_plain(text[pos:m.start()], ids)
            ids.append(self.token_to_id[m.group()])
            pos = m.end()
        self._encode_plain(text[pos:], ids)
        return ids

    def _encode_plain(self, text: str, ids: list[int]) -> None:
        """Byte-level BPE of special-free text, appended to `ids`."""
        if not text:
            return
        b2u = bytes_to_unicode()
        for m in self._re.finditer(text):
            mapped = "".join(b2u[b] for b in m.group().encode("utf-8"))
            for piece in self._bpe(list(mapped)):
                tid = self.token_to_id.get(piece)
                if tid is not None:
                    ids.append(tid)
                else:  # unmergeable piece: emit per-char byte tokens
                    ids.extend(self.token_to_id[c] for c in piece
                               if c in self.token_to_id)

    def decode(self, ids: list[int]) -> str:
        u2b = unicode_to_bytes()
        # special tokens are markup, not text (sentencepiece control
        # pieces are empty strings; BPE specials like <|end_of_text|>
        # would otherwise render literally into every stop_at_eos
        # generation)
        chars = "".join(self.tokens[i] for i in ids
                        if 0 <= i < len(self.tokens)
                        and i not in self.special_ids)
        data = bytes(u2b[c] for c in chars if c in u2b)
        return data.decode("utf-8", "replace")

    # ggjt-writer compatibility surface (piece bytes + score), so a BPE
    # vocab survives quantize round-trips through the common writers
    @property
    def tokens_scored(self) -> list[tuple[bytes, float]]:
        return [(t.encode(), 0.0) for t in self.tokens]


def bpe_vocab_from_tokenizer_json(path: str, bos_id: int, eos_id: int) -> BPEVocab:
    """Build from an HF tokenizer.json (BPE model — the LLaMA-3 family
    ships these instead of sentencepiece tokenizer.model files). The
    pre-tokenizer's split regex is lifted verbatim when present."""
    import json

    with open(path, encoding="utf-8") as f:
        data = json.load(f)
    model = data.get("model", {})
    if model.get("type") != "BPE":
        raise ValueError(f"{path}: tokenizer.json model type "
                         f"{model.get('type')!r} is not BPE")
    vocab_map = model["vocab"]
    size = max(vocab_map.values()) + 1
    for extra in data.get("added_tokens", []):
        size = max(size, int(extra["id"]) + 1)
    tokens = [""] * size
    for piece, idx in vocab_map.items():
        tokens[idx] = piece
    specials = set()
    for extra in data.get("added_tokens", []):
        tokens[int(extra["id"])] = extra["content"]
        if extra.get("special"):
            specials.add(int(extra["id"]))
    ranks = {}
    for rank, m in enumerate(model.get("merges", [])):
        pair = tuple(m) if isinstance(m, list) else tuple(m.split(" "))
        ranks[pair] = rank

    pattern = "gpt2"
    pre = data.get("pre_tokenizer") or {}
    chain = pre.get("pretokenizers", [pre])
    for p in chain:
        pat = (p or {}).get("pattern", {})
        if isinstance(pat, dict) and "Regex" in pat:
            pattern = pat["Regex"]
            break
    return BPEVocab(tokens=tokens, merges=ranks, bos_id=bos_id,
                    eos_id=eos_id, pattern=pattern,
                    special_ids=frozenset(specials | {bos_id, eos_id}))


def bpe_vocab_from_gguf(meta: dict) -> BPEVocab:
    """Build from GGUF metadata: tokenizer.ggml.{tokens,merges,pre,
    bos_token_id,eos_token_id}."""
    tokens = [t.decode("utf-8", "replace") if isinstance(t, bytes) else str(t)
              for t in meta.get("tokenizer.ggml.tokens", [])]
    merges = {}
    for rank, m in enumerate(meta.get("tokenizer.ggml.merges", [])):
        s = m.decode("utf-8", "replace") if isinstance(m, bytes) else str(m)
        left, _, right = s.partition(" ")
        merges[(left, right)] = rank
    pre = meta.get("tokenizer.ggml.pre", b"gpt2")
    pre = pre.decode() if isinstance(pre, bytes) else str(pre)
    if pre not in PATTERNS and "\\p{" not in pre:
        import warnings

        warnings.warn(
            f"unknown tokenizer.ggml.pre={pre!r}; falling back to the "
            "gpt2 pre-tokenizer — token boundaries may differ from the "
            "model's training tokenizer", stacklevel=2)
        pre = "gpt2"
    import numpy as np

    types = meta.get("tokenizer.ggml.token_type", np.array([], np.int32))
    specials = {i for i, t in enumerate(np.asarray(types).tolist())
                if t == _GGUF_TOK_CONTROL}
    bos_id = int(meta.get("tokenizer.ggml.bos_token_id", 0))
    eos_id = int(meta.get("tokenizer.ggml.eos_token_id", 1))
    return BPEVocab(
        tokens=tokens,
        merges=merges,
        bos_id=bos_id,
        eos_id=eos_id,
        pattern=pre,
        special_ids=frozenset(specials | {bos_id, eos_id}),
    )
