import numpy as np
import pytest

from lsh_ray.functions.hashing import (combine_columns, hash_pair,
                                       hash_strings, rolling_hash, splitmix64)


def test_hash_strings_deterministic():
    a = hash_strings(["foo", "bar", "foo"])
    b = hash_strings(["foo", "bar", "foo"])
    assert a.dtype == np.uint64
    assert (a == b).all()
    assert a[0] == a[2] and a[0] != a[1]


def test_hash_strings_empty():
    assert hash_strings([]).shape == (0,)


def test_splitmix_bijective_distinct():
    x = np.arange(1000, dtype=np.uint64)
    y = splitmix64(x)
    assert len(np.unique(y)) == 1000


def test_rolling_hash_window_count():
    h = np.arange(10, dtype=np.uint64)
    assert rolling_hash(h, 3).shape == (8,)
    assert rolling_hash(h, 3, stride=2).shape == (4,)
    assert rolling_hash(h[:2], 3).shape == (0,)


def test_rolling_hash_position_invariance():
    # same k-gram content => same hash, regardless of position
    h1 = hash_strings(["a", "b", "c", "d", "e"])
    h2 = hash_strings(["x", "a", "b", "c", "d", "e"])
    r1 = rolling_hash(h1, 3)
    r2 = rolling_hash(h2, 3)
    assert set(r1.tolist()) <= set(r2.tolist())


def test_combine_columns_salt():
    a = np.array([1, 2], dtype=np.uint64)
    b = np.array([3, 4], dtype=np.uint64)
    c0 = combine_columns([a, b], salt=0)
    c1 = combine_columns([a, b], salt=1)
    assert (c0 != c1).all()
    assert (combine_columns([a, b], salt=0) == c0).all()


def test_hash_pair_order_sensitive():
    a = np.array([1], dtype=np.uint64)
    b = np.array([2], dtype=np.uint64)
    assert hash_pair(a, b)[0] != hash_pair(b, a)[0]


def test_arrow_tokenizer_matches_text_path():
    """token_hashes_from_arrow must produce hashes and counts identical
    to the Python-string path on edge cases: nulls, empties,
    whitespace-only, multi-chunk, sliced arrays, unicode."""
    import numpy as np
    import pyarrow as pa

    from lsh_ray.functions.bytetokens import (token_hashes_from_arrow,
                                              token_hashes_from_texts)
    texts = ["hello World", "", "  ", "a", " lead trail ", "ünïcode tökens",
             "x " * 500, "singleword"]
    arr = pa.chunked_array([pa.array(texts[:3]),
                            pa.array([None], type=pa.string()),
                            pa.array(texts[3:])])
    h_a, c_a = token_hashes_from_arrow(arr)
    h_t, c_t = token_hashes_from_texts(texts[:3] + [None] + texts[3:])
    assert np.array_equal(h_a, h_t)
    assert np.array_equal(c_a, c_t)
    # sliced array keeps buffer offsets honest
    sl = pa.array(["drop this", *texts]).slice(1)
    h_s, c_s = token_hashes_from_arrow(sl)
    h_e, c_e = token_hashes_from_texts(texts)
    assert np.array_equal(h_s, h_e) and np.array_equal(c_s, c_e)
    # trailing/leading EMPTY docs: an empty last doc's start offset is
    # one past the chunk's data (regression: IndexError pre-fix)
    for edge in (["a b c", ""], ["", "a b c"], ["", ""], ["a", "", ""]):
        h_a, c_a = token_hashes_from_arrow(pa.array(edge))
        h_t, c_t = token_hashes_from_texts(edge)
        assert np.array_equal(h_a, h_t), edge
        assert np.array_equal(c_a, c_t), edge


def test_chunk_bigram_keys_position_independent_and_noise_free():
    """Chunk keys are bigrams of consecutive content-defined chunks: a
    long verbatim run shared at DIFFERENT positions yields shared keys
    (substring recall), while a single short shared phrase (one chunk,
    the boilerplate noise case) yields none."""
    import numpy as np

    from lsh_ray.stages.chunking import chunk_keys_for_batch

    rng = np.random.default_rng(7)
    run = rng.integers(0, 2**64, 400, dtype=np.uint64)     # shared run
    pre = rng.integers(0, 2**64, 150, dtype=np.uint64)
    post = rng.integers(0, 2**64, 250, dtype=np.uint64)
    doc_a = run                                            # run at pos 0
    doc_b = np.concatenate([pre, run, post])               # run shifted
    offs = np.array([0, len(doc_a), len(doc_a) + len(doc_b)], np.int64)
    keys, docs = chunk_keys_for_batch(
        np.concatenate([doc_a, doc_b]), offs, divisor=8, min_tokens=4)
    shared = np.intersect1d(keys[docs == 0], keys[docs == 1])
    assert len(shared) >= 1, "long shared run must share a chunk bigram"

    # a single ~chunk-sized shared phrase must NOT create a candidate key
    phrase = rng.integers(0, 2**64, 8, dtype=np.uint64)
    doc_c = np.concatenate([rng.integers(0, 2**64, 300, dtype=np.uint64),
                            phrase,
                            rng.integers(0, 2**64, 300, dtype=np.uint64)])
    doc_d = np.concatenate([rng.integers(0, 2**64, 200, dtype=np.uint64),
                            phrase,
                            rng.integers(0, 2**64, 400, dtype=np.uint64)])
    offs2 = np.array([0, len(doc_c), len(doc_c) + len(doc_d)], np.int64)
    keys2, docs2 = chunk_keys_for_batch(
        np.concatenate([doc_c, doc_d]), offs2, divisor=8, min_tokens=4)
    shared2 = np.intersect1d(keys2[docs2 == 0], keys2[docs2 == 1])
    assert len(shared2) == 0, "one shared phrase must not emit a key"
