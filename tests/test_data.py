"""Data pipeline batching: shapes, masks, and the prompt layout contract."""

import numpy as np

from mars5_tts_tpu.data import (Utterance, batches, make_ar_batch,
                                make_nar_batch, synthetic_corpus)


def test_ar_batch_layout():
    utts = [Utterance(text_ids=np.array([1, 2, 3]),
                      codes=np.arange(40).reshape(5, 8) % 32),
            Utterance(text_ids=np.array([4, 5]),
                      codes=np.arange(24).reshape(3, 8) % 32)]
    tokens, mask, spk = make_ar_batch(utts, n_text_vocab_offset=100, eos_idx=999,
                                      pad_to=12, spk_pad_to=6)
    assert tokens.shape == (2, 12) and mask.shape == (2, 11) and spk.shape == (2, 6, 8)
    # row 0: [1,2,3, codes+100..., eos]
    assert tokens[0, :3].tolist() == [1, 2, 3]
    assert tokens[0, 3] == utts[0].codes[0, 0] + 100
    assert tokens[0, 8] == 999  # eos after 5 speech tokens
    # loss starts at the last text position (predicting the first speech token)
    assert mask[0, :2].tolist() == [0, 0]
    # mask indices 2..7 are live (targets: first speech token ... eos at 8)
    assert mask[0, 2] == 1 and mask[0, 7] == 1 and mask[0, 8] == 0
    # speaker codes padded with 1024
    assert (spk[1, 3:] == 1024).all() and (spk[1, :3] == utts[1].codes).all()


def test_nar_batch_masks():
    utts = [Utterance(text_ids=np.array([1, 2]), codes=np.ones((4, 8), int)),
            Utterance(text_ids=np.array([3]), codes=np.ones((2, 8), int))]
    c_text, c_codes, ctl, ccl, x0, xpm = make_nar_batch(utts, pad_to=6, text_pad_to=3)
    assert c_codes.shape == (2, 6, 8) and xpm.shape == (2, 6)
    assert ctl.tolist() == [2, 1] and ccl.tolist() == [4, 2]
    assert (c_codes[1, 2:] == 1024).all()
    assert xpm[0].tolist() == [False] * 4 + [True] * 2


def test_batches_iterator_fixed_shapes():
    corpus = synthetic_corpus(16, text_vocab=32)
    shapes = set()
    for ar_b, nar_b in batches(corpus, 4, n_text_vocab_offset=32, eos_idx=900,
                               ar_pad_to=96, spk_pad_to=64, frames_pad_to=64,
                               text_pad_to=24):
        shapes.add(tuple(x.shape for x in ar_b) + tuple(x.shape for x in nar_b))
    assert len(shapes) == 1  # one compile for the whole epoch
