"""SentencePiece-BPE tokenizer (greedy score-priority bigram merge).

Behavioral parity with the reference tokenizer
(reference: pkg/ml/ml.go:2648-2848):

  * the text is split into UTF-8 characters via a high-nibble length
    table (ml.go:2705-2709);
  * all adjacent pairs seed a max-priority queue keyed by the merged
    token's vocab score, ties broken toward the smaller left index
    (PopMax, ml.go:2719-2737);
  * pairs are merged greedily while any merge is possible
    (ml.go:2797-2821);
  * symbols that never formed a vocab token fall back to byte tokens
    with id = byte + 3 (ml.go:2829-2833);
  * BOS=1 / EOS=2 (ml.go:26-27), newline = token 13 (ml.go:2758).

Differences from the reference (documented divergences):
  * the reference's byte fallback does `uint32(byte + 3)` on a Go byte,
    which WRAPS for bytes 253..255 (producing ids 0..2). We follow
    llama.cpp's intent: id = int(byte) + 3, no wrap.
  * PopMax in the reference is an O(n) linear scan per pop; we use a
    binary heap with the identical ordering key.

The vocab itself is stored in the ggjt checkpoint (scored pieces with
U+2581 already replaced by ' ' at conversion time — see
reference: scripts/convert-pth-to-ggml.py:120-137), so detokenization is
plain byte concatenation (Token2Str, ml.go:2711-2717).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

BOS_TOKEN = 1  # reference: pkg/ml/ml.go:26
EOS_TOKEN = 2  # reference: pkg/ml/ml.go:27
NEWLINE_TOKEN = 13  # reference: pkg/ml/ml.go:2758

# UTF-8 char length from the high nibble of the lead byte
# (reference: pkg/ml/ml.go:2705-2709).
_UTF8_LEN = (1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 3, 4)


def utf8_len(lead_byte: int) -> int:
    return _UTF8_LEN[lead_byte >> 4]


@dataclass
class Vocab:
    """Scored vocabulary (reference: Vocab, pkg/ml/ml.go:2653-2664).

    tokens[i] = (piece_bytes, score). Pieces are stored as bytes because
    byte-fallback tokens are raw single bytes that need not be valid UTF-8.
    """

    tokens: list[tuple[bytes, float]]
    token_to_id: dict[bytes, int] = field(init=False)

    def __post_init__(self) -> None:
        # Later duplicate pieces win, matching the Go map-assignment loop
        # (reference: pkg/llama/llama.go:805-810).
        self.token_to_id = {t: i for i, (t, _) in enumerate(self.tokens)}

    def __len__(self) -> int:
        return len(self.tokens)

    @property
    def size(self) -> int:
        return len(self.tokens)

    def id_to_piece(self, token_id: int) -> bytes:
        # Out-of-range => empty, matching Token2Str (ml.go:2711-2717).
        if 0 <= token_id < len(self.tokens):
            return self.tokens[token_id][0]
        return b""

    def score(self, token_id: int) -> float:
        return self.tokens[token_id][1]


def tokenize(vocab: Vocab, text: str | bytes, bos: bool = False) -> list[int]:
    """Greedy score-priority BPE (reference: Tokenize, pkg/ml/ml.go:2761-2848).

    Byte-level-BPE vocabs (tokenizer_bpe.BPEVocab, LLaMA-3 family)
    dispatch to their own encoder."""
    if hasattr(vocab, "encode"):
        if isinstance(text, bytes):
            text = text.decode("utf-8", "replace")
        return vocab.encode(text, bos=bos)
    data = text.encode("utf-8") if isinstance(text, str) else text

    output: list[int] = []
    if bos:
        output.append(BOS_TOKEN)
    if not data:
        return output

    # --- split into UTF-8 characters: (start, length) with a doubly-linked
    # chain through prev/next indices (ml.go:2775-2790).
    starts: list[int] = []
    lengths: list[int] = []
    offs = 0
    while offs < len(data):
        n = min(len(data) - offs, utf8_len(data[offs]))
        starts.append(offs)
        lengths.append(n)
        offs += n
    count = len(starts)
    prev = list(range(-1, count - 1))
    nxt = [i + 1 for i in range(count)]
    nxt[count - 1] = -1

    # Max-priority queue: higher score first, then smaller left index
    # (PopMax ordering, ml.go:2722-2726). heapq is a min-heap, so negate
    # the score.
    queue: list[tuple[float, int, int, int]] = []  # (-score, left, right, size)

    def try_add_bigram(left: int, right: int) -> None:
        # reference: TryAddBigram, ml.go:2739-2756
        if left == -1 or right == -1:
            return
        merged = data[starts[left] : starts[left] + lengths[left] + lengths[right]]
        tid = vocab.token_to_id.get(merged)
        if tid is None:
            return
        heapq.heappush(queue, (-vocab.score(tid), left, right, len(merged)))

    for i in range(1, count):
        try_add_bigram(i - 1, i)

    while queue:
        neg_score, left, right, size = heapq.heappop(queue)
        # Skip stale entries where a symbol was already merged
        # (ml.go:2803-2806).
        if lengths[left] == 0 or lengths[right] == 0 or lengths[left] + lengths[right] != size:
            continue
        # Merge right into left (ml.go:2808-2816).
        lengths[left] += lengths[right]
        lengths[right] = 0
        nxt[left] = nxt[right]
        if nxt[right] >= 0:
            prev[nxt[right]] = left
        # Find further substitutions (ml.go:2818-2820).
        try_add_bigram(prev[left], left)
        try_add_bigram(left, nxt[left])

    # Walk the chain; unknown symbols fall back to byte tokens
    # (ml.go:2823-2838). NOTE divergence: no byte+3 wrap (see module doc).
    i = 0
    while i != -1:
        piece = data[starts[i] : starts[i] + lengths[i]]
        tid = vocab.token_to_id.get(piece)
        if tid is None:
            output.extend(b + 3 for b in piece)
        else:
            output.append(tid)
        i = nxt[i]

    return output


def detokenize(vocab: Vocab, token_ids: list[int]) -> str:
    if hasattr(vocab, "decode"):  # byte-level BPE vocab
        return vocab.decode(token_ids)
    """Concatenate raw pieces (reference: Token2Str use in server.go:228-236)."""
    return b"".join(vocab.id_to_piece(t) for t in token_ids).decode("utf-8", errors="replace")
