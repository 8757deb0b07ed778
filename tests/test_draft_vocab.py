"""Draft-vocabulary construction tests (scandata equivalent)."""
import numpy as np

from hsd_tpu.train.draft_vocab import build_draft_vocab, count_tokens


def test_build_draft_vocab():
    counts = np.array([5, 100, 2, 50, 80, 1, 60, 0])
    d2t, t2d = build_draft_vocab(counts, 4)
    # top-4 by freq: ids 1(100), 4(80), 6(60), 3(50) -> sorted [1, 3, 4, 6]
    assert t2d.sum() == 4
    np.testing.assert_array_equal(np.where(t2d)[0], [1, 3, 4, 6])
    # target_id = draft_id + d2t[draft_id]
    np.testing.assert_array_equal(np.arange(4) + d2t, [1, 3, 4, 6])


def test_count_tokens():
    chunks = [np.array([[0, 1], [1, 2]]), np.array([2, 2])]
    c = count_tokens(chunks, 4)
    np.testing.assert_array_equal(c, [1, 2, 3, 0])
