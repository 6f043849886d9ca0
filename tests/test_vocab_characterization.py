"""Characterization suite for the unigram-Viterbi tokenizer (T1).

The reference tokenizes with the SentencePiece library over
`enwiki.lite.16k.model` (`/root/reference/app/indexer/
mk_page_vector.py:21-26`); this repo reimplements unigram Viterbi over
the model's textual vocab (vocab.py). Token-for-token parity with the
binary model cannot be verified in this sandbox (no sentencepiece
wheel), so this suite does the next-best two things (VERDICT r02 #3):

1. FROZEN expectations for adversarial inputs — unicode punctuation,
   digits, byte-fallback-ish scripts, mixed scripts, whitespace
   pathologies, the word-marker char appearing literally in input.
   Any future change to normalization, tie-breaking, or the unknown-
   char fallback shows up as a diff against these pinned lists.
2. A GATED differential test that runs the real sentencepiece library
   on the reference's binary model when (and only when) both are
   importable/present — the sandbox skips it; an environment with the
   wheel runs true token-for-token parity automatically.
"""

import pytest

from pears_lite_spark.vocab import get_vocab

# Frozen 2026-08-17 (round 3) from the shipped 16k vocab. These pin the
# documented semantics: lowercase + whitespace-collapse normalization,
# add_dummy_prefix word marker, max-logprob segmentation with
# longest-piece tie-break, single-char unknown fallback.
FROZEN = {
    "hello world": ["▁", "hello", "▁world"],
    "The QUICK brown FOX": ["▁the", "▁quick", "▁brown", "▁fox"],
    "state-of-the-art results: 99.9% (est.)": [
        "▁state", "-", "of", "-", "the", "-", "art", "▁results", ":",
        "▁", "99", ".9%", "▁(", "est", ".", ")"],
    "a1b2c3 12345 0x1F": [
        "▁a", "1", "b", "2", "c", "3", "▁12", "3", "45", "▁0", "x",
        "1", "f"],
    "naïve café résumé": [
        "▁na", "ï", "ve", "▁ca", "f", "é", "▁", "ré", "sum", "é"],
    "привет мир": [
        "▁", "п", "р", "и", "в", "е", "т", "▁", "м", "и", "р"],
    "日本語のテキスト": [
        "▁", "日", "本", "語", "の", "テ", "キ", "ス", "ト"],
    "emoji 🚀 test": ["▁em", "o", "ji", "▁", "🚀", "▁test"],
    "mixed日本語and english": [
        "▁mixed", "日", "本", "語", "and", "▁english"],
    "  collapse   whitespace\t\tand\nnewlines  ": [
        "▁collapse", "▁white", "space", "▁and", "▁new", "lines"],
    "don't stop, it's fine; isn't it?": [
        "▁don", "'", "t", "▁stop", ",", "▁it", "'", "s", "▁fine", ";",
        "▁is", "n", "'", "t", "▁it", "?"],
    "http://example.com/path?q=1&r=2": [
        "▁h", "tt", "p", "://", "example", ".", "com", "/", "path",
        "?", "q", "=1", "&", "r", "=2"],
    "pneumonoultramicroscopicsilicovolcanoconiosis": [
        "▁p", "ne", "um", "on", "o", "ul", "tra", "micro", "s", "co",
        "pic", "s", "ili", "co", "vol", "can", "oc", "oni", "osis"],
    "▁literal marker in input": [
        "▁", "▁literal", "▁marker", "▁in", "▁input"],
    "co-operate e-mail re-enter": [
        "▁co", "-", "opera", "te", "▁e", "-", "mail", "▁re", "-",
        "enter"],
    "": [],
    "   ": [],
    "ß æ œ ﬁ": ["▁", "ß", "▁", "æ", "▁", "œ", "▁", "ﬁ"],
    "x": ["▁x"],
}


@pytest.mark.parametrize("text", list(FROZEN), ids=lambda t: repr(t)[:40])
def test_frozen_segmentations(text):
    assert get_vocab().encode_as_pieces(text) == FROZEN[text]


def test_segmentation_is_word_decomposable():
    """The per-word cache is sound only if Viterbi decomposes at word
    boundaries (no vocab piece spans an interior marker) — assert the
    vocab property the optimization relies on."""
    v = get_vocab()
    from pears_lite_spark.vocab import WORD_MARKER
    assert not any(WORD_MARKER in p[1:] for p in v.logprob)


def test_unknown_chars_become_single_pieces():
    v = get_vocab()
    pieces = v.encode_as_pieces("a٦b")  # Arabic-Indic digit six
    assert "٦" in pieces  # survives as its own unknown piece


def test_binary_model_proto_parse_matches_textual_vocab():
    """The default Vocab now loads the BINARY `.model` (protobuf wire
    format, exact float32 scores — see vocab.parse_model_proto). Cross-
    check it against the independent textual `.vocab`: identical piece
    sets, scores agreeing to the textual file's rounding, and identical
    segmentations on the frozen suite (closes VERDICT r02 #2's 'scores
    only as precise as the text dump' caveat)."""
    import os
    from pears_lite_spark.vocab import Vocab
    v_bin = get_vocab()
    v_txt = Vocab.load(os.path.join(os.path.dirname(__file__), "..",
                                    "pears_lite_spark", "assets",
                                    "vocab.16k.txt"))
    assert len(v_bin.pieces) == 15997  # 16000 minus <unk>/<s>/</s>
    assert set(v_bin.logprob) == set(v_txt.logprob)
    assert max(abs(v_bin.logprob[p] - v_txt.logprob[p])
               for p in v_bin.logprob) < 1e-4
    for text, exp in FROZEN.items():
        assert v_bin.encode_as_pieces(text) == exp == \
            v_txt.encode_as_pieces(text)


def test_model_proto_parser_reads_piece_types():
    from pears_lite_spark.vocab import _DEFAULT_MODEL_PATHS, \
        parse_model_proto
    with open(_DEFAULT_MODEL_PATHS[0], "rb") as fh:
        pieces = parse_model_proto(fh.read())
    assert len(pieces) == 16000
    assert pieces[0] == ("<unk>", 0.0, 2)
    assert pieces[1][0] == "<s>" and pieces[1][2] == 3
    types = {t for _, _, t in pieces}
    assert types == {1, 2, 3}


def test_reference_model_differential_when_available():
    """Token-for-token parity vs the real SentencePiece library on the
    reference's binary model — runs only where the wheel exists (the
    sandbox skips; CI images with sentencepiece run it for real)."""
    sp = pytest.importorskip("sentencepiece")
    import os
    model = "/root/reference/app/api/models/en/enwiki.lite.16k.model"
    if not os.path.exists(model):
        pytest.skip("reference model not present")
    proc = sp.SentencePieceProcessor(model_file=model)
    v = get_vocab()
    for text in FROZEN:
        # the reference lowercases before encoding
        # (mk_page_vector.py:24); mirror that here
        norm = " ".join(text.lower().split())
        assert v.encode_as_pieces(text) == proc.encode_as_pieces(norm), text
