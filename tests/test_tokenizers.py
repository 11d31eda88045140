"""Tokenizer parity: our minbpe implementation vs the reference, plus format tests."""

import io

import pytest

from tests.conftest import add_reference_to_path, reference_available
from mars5_tts_tpu.text import CodebookTokenizer, GPT4_SPLIT_PATTERN, RegexTokenizer

CORPUS = (
    "We actually haven't managed to meet demand. The quick brown rat jumped over "
    "the lazy dog!? Numbers: 1234 5678 90, punctuation... and CONTRACTIONS it's "
    "they'll we've I'd. Unicode: naïve café 東京 üöä. newlines\nand\ttabs.  spaces"
) * 3

TEXTS = [
    "The quick brown rat.",
    "hello world",
    "<|startoftext|>We actually haven't managed to meet demand.<|endoftext|>",
    "UPPER lower 123 456789 ... !!",
    "naïve café 東京",
    "",
    " ",
    "a",
]


def _train_pair_text():
    ours = RegexTokenizer(GPT4_SPLIT_PATTERN)
    ours.train(CORPUS, 256 + 64)
    ours.register_special_tokens({"<|startoftext|>": 256 + 64, "<|endoftext|>": 256 + 65})
    return ours


def test_regex_roundtrip_and_format():
    tok = _train_pair_text()
    for t in TEXTS:
        ids = tok.encode(t, allowed_special="all")
        assert tok.decode(ids) == t
    # save/load round trip through the minbpe-v1 text format
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        prefix = os.path.join(d, "tok")
        tok.save(prefix)
        fresh = RegexTokenizer()
        fresh.load(prefix + ".model")
        assert fresh.merges == tok.merges
        assert fresh.special_tokens == tok.special_tokens
        for t in TEXTS:
            assert fresh.encode(t, allowed_special="all") == tok.encode(t, allowed_special="all")
        # BytesIO load path (how checkpoints embed vocabs)
        with open(prefix + ".model", "rb") as f:
            blob = f.read()
        fresh2 = RegexTokenizer()
        fresh2.load(io.BytesIO(blob))
        assert fresh2.merges == tok.merges


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_regex_parity_vs_reference():
    add_reference_to_path()
    from mars5.minbpe.regex import RegexTokenizer as RefRegex

    ref = RefRegex(GPT4_SPLIT_PATTERN)
    ref.train(CORPUS, 256 + 64)
    ref.register_special_tokens({"<|startoftext|>": 256 + 64, "<|endoftext|>": 256 + 65})

    ours = _train_pair_text()
    assert ours.merges == ref.merges, "training produced different merges"
    for t in TEXTS:
        assert ours.encode(t, allowed_special="all") == ref.encode(t, allowed_special="all"), t
    # long adversarial string with heavy merge chains
    long_t = CORPUS + " " + CORPUS[::-1]
    assert ours.encode_ordinary(long_t) == ref.encode_ordinary(long_t)


def _codes_corpus(rng_seed=0, n=4000, k=64):
    import random
    rnd = random.Random(rng_seed)
    # skewed distribution so BPE has pairs to merge
    codes = [rnd.randint(0, k - 1) ** 2 % k for _ in range(n)]
    return " ".join(str(c) for c in codes)


def test_codebook_roundtrip_and_decode_int():
    corpus = _codes_corpus()
    tok = CodebookTokenizer(GPT4_SPLIT_PATTERN, codebook_size=1024)
    tok.train(corpus, 1024 + 48)
    tok.register_special_tokens({"<|endofspeech|>": 1024 + 48})

    sample = " ".join(str(i % 64) for i in range(257))
    ids = tok.encode(sample)
    back = tok.decode_int(ids)
    assert back == [i % 64 for i in range(257)]

    # decode_int keeps specials as strings
    ids2 = ids + [tok.special_tokens["<|endofspeech|>"]]
    back2 = tok.decode_int(ids2)
    assert back2[:-1] == [i % 64 for i in range(257)]
    assert back2[-1] == "<|endofspeech|>"


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_codebook_parity_vs_reference():
    add_reference_to_path()
    from mars5.minbpe.codebook import CodebookTokenizer as RefCodebook

    corpus = _codes_corpus()
    ref = RefCodebook(GPT4_SPLIT_PATTERN, codebook_size=1024)
    ref.train(corpus, 1024 + 48)
    ref.register_special_tokens({"<|endofspeech|>": 1024 + 48})

    ours = CodebookTokenizer(GPT4_SPLIT_PATTERN, codebook_size=1024)
    ours.train(corpus, 1024 + 48)
    ours.register_special_tokens({"<|endofspeech|>": 1024 + 48})

    assert ours.merges == ref.merges
    for seed in range(4):
        probe = _codes_corpus(rng_seed=seed + 100, n=700)
        assert ours.encode(probe.strip()) == ref.encode(probe.strip()), f"seed {seed}"
        ids = ours.encode(probe.strip())
        assert ours.decode_int(ids) == ref.decode_int(ids)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_codebook_minbpe_v1_wire_compat():
    """A model file saved by the reference loads in ours and vice versa."""
    add_reference_to_path()
    from mars5.minbpe.codebook import CodebookTokenizer as RefCodebook

    corpus = _codes_corpus()
    ref = RefCodebook(GPT4_SPLIT_PATTERN, codebook_size=1024)
    ref.train(corpus, 1024 + 32)
    ref.register_special_tokens({"<|endofspeech|>": 1024 + 32})

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        prefix = os.path.join(d, "ref")
        ref.save(prefix)
        ours = CodebookTokenizer(GPT4_SPLIT_PATTERN, codebook_size=1024)
        ours.load(prefix + ".model")
        assert ours.merges == ref.merges
        assert ours.special_tokens == ref.special_tokens
        probe = _codes_corpus(rng_seed=7, n=500).strip()
        assert ours.encode(probe) == ref.encode(probe)
