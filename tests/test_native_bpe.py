"""Native C++ BPE engine: exact agreement with the Python merge + speedup."""

import time

import numpy as np
import pytest

from mars5_tts_tpu.text import CodebookTokenizer, GPT4_SPLIT_PATTERN
from mars5_tts_tpu.text import native
from mars5_tts_tpu.text.minbpe import _merge_ids

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ or native build unavailable")


def _trained_tok(seed=0, n_merges=200):
    rng = np.random.default_rng(seed)
    corpus = " ".join(str(int(x)) for x in rng.integers(0, 64, 20000) ** 2 % 64)
    tok = CodebookTokenizer(GPT4_SPLIT_PATTERN, codebook_size=1024)
    tok.train(corpus, 1024 + n_merges)
    return tok


def test_native_matches_python_exactly():
    tok = _trained_tok()
    table = native.MergeTable(tok.merges)
    rng = np.random.default_rng(1)
    for n in (2, 3, 32, 100, 1000, 5000):
        ids = (rng.integers(0, 64, n) ** 2 % 64).tolist()
        assert native.merge_ids_native(ids, table) == _merge_ids(ids, tok.merges), n


def test_tokenizer_uses_native_and_agrees():
    import os

    tok = _trained_tok(seed=2)
    rng = np.random.default_rng(3)
    seq = " ".join(str(int(x)) for x in rng.integers(0, 64, 3000) ** 2 % 64)

    fast = tok.encode(seq)
    os.environ["MARS5_NO_NATIVE_BPE"] = "1"
    try:
        slow = tok.encode(seq)
    finally:
        del os.environ["MARS5_NO_NATIVE_BPE"]
    assert fast == slow
    assert len(fast) < 3000  # merges actually applied


@pytest.mark.heavy
def test_native_speedup():
    tok = _trained_tok(seed=4, n_merges=500)
    rng = np.random.default_rng(5)
    ids = (rng.integers(0, 64, 50_000) ** 2 % 64).tolist()
    table = native.MergeTable(tok.merges)

    t0 = time.perf_counter()
    out_n = native.merge_ids_native(ids, table)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    out_p = _merge_ids(ids, tok.merges)
    t_python = time.perf_counter() - t0

    assert out_n == out_p
    assert t_native < t_python, (t_native, t_python)
    print(f"native {t_native*1e3:.1f}ms vs python {t_python*1e3:.1f}ms "
          f"({t_python/t_native:.1f}x)")
