"""Tokenizer behavior parity tests (reference: pkg/ml/ml.go:2761-2848)."""

from llamago_tpu.tokenizer import (
    BOS_TOKEN,
    EOS_TOKEN,
    NEWLINE_TOKEN,
    Vocab,
    detokenize,
    tokenize,
    utf8_len,
)


def ids_to_pieces(vocab, ids):
    return [vocab.id_to_piece(t) for t in ids]


def test_bos_and_empty(test_vocab):
    assert tokenize(test_vocab, "", bos=True) == [BOS_TOKEN]
    assert tokenize(test_vocab, "", bos=False) == []
    assert BOS_TOKEN == 1 and EOS_TOKEN == 2


def test_greedy_merge_prefers_higher_score(test_vocab):
    # "hello": merges should reach the single piece b"hello" (score -1.0
    # beats partial merges).
    ids = tokenize(test_vocab, "hello")
    assert ids_to_pieces(test_vocab, ids) == [b"hello"]


def test_leading_space_merge(test_vocab):
    # " hello world" -> [" hello", " world"] with the standard
    # leading-space normalization the caller applies
    # (reference: server.go:120 prepends ' ' to every prompt).
    ids = tokenize(test_vocab, " hello world")
    assert ids_to_pieces(test_vocab, ids) == [b" hello", b" world"]


def test_byte_fallback(test_vocab):
    # "Z" is not any piece: falls back to byte id = ord + 3
    # (reference: ml.go:2829-2833).
    ids = tokenize(test_vocab, "Zh")
    assert ids[0] == ord("Z") + 3
    # multibyte UTF-8 char falls back to one byte token per byte
    ids = tokenize(test_vocab, "é")  # 2 bytes: 0xC3 0xA9
    assert ids == [0xC3 + 3, 0xA9 + 3]


def test_utf8_split_lengths():
    assert utf8_len(ord("a")) == 1
    assert utf8_len("é".encode()[0]) == 2
    assert utf8_len("€".encode()[0]) == 3
    assert utf8_len("🦙".encode()[0]) == 4


def test_merge_tie_break_prefers_leftmost():
    # Two possible merges with equal score: reference PopMax picks the
    # smaller left index (ml.go:2722-2726). Text "abab" with pieces
    # "ab" (score -1) twice: both merge; leftmost first. Result must be
    # ["ab", "ab"], not a stuck middle merge.
    tokens = [(b"", 0.0)] * 3 + [(bytes([b]), -1000.0) for b in range(256)]
    tokens += [(b"a", -10.0), (b"b", -10.0), (b"ab", -1.0), (b"ba", -1.0)]
    v = Vocab(tokens)
    ids = tokenize(v, "abab")
    assert [v.id_to_piece(t) for t in ids] == [b"ab", b"ab"]


def test_detokenize_roundtrip(test_vocab):
    text = " hello world"
    ids = tokenize(test_vocab, text)
    assert detokenize(test_vocab, ids) == text


def test_newline_constant(test_vocab):
    # Token 13 is hardwired as newline in the reference (ml.go:2758);
    # in a real ggjt vocab id 13 is the byte piece b"\n" (byte 10 + 3).
    assert NEWLINE_TOKEN == 13
    assert test_vocab.id_to_piece(13) == bytes([10])


def test_stale_queue_entries_skipped():
    # After "ab" merges, the pending ("b","c") bigram is stale; the
    # size-check must skip it (reference: ml.go:2803-2806).
    tokens = [(b"", 0.0)] * 3 + [(bytes([b]), -1000.0) for b in range(256)]
    tokens += [
        (b"a", -10.0), (b"b", -10.0), (b"c", -10.0),
        (b"ab", -1.0), (b"bc", -2.0), (b"abc", -0.5),
    ]
    v = Vocab(tokens)
    ids = tokenize(v, "abc")
    assert [v.id_to_piece(t) for t in ids] == [b"abc"]
