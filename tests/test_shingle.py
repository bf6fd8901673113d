import numpy as np
import pyarrow as pa
import pytest

from lsh_ray.config import PipelineConfig
from lsh_ray.stages.shingle import (shingle_batch,
                                    shingle_sets_from_token_lists,
                                    tokenize_text_series)
import pandas as pd


def _sets(token_lists, k, stride=1):
    vals, offsets = shingle_sets_from_token_lists(token_lists, k, stride)
    return [set(vals[offsets[i]:offsets[i + 1]].tolist())
            for i in range(len(token_lists))]


def test_window_count_matches_reference_formula():
    # reference window arithmetic (lsh.py:55-60): n - k + 1 starts
    toks = [f"w{i}" for i in range(10)]
    vals, offsets = shingle_sets_from_token_lists([toks], 3)
    assert offsets[1] == 8  # all distinct tokens -> all 8 windows distinct


def test_set_semantics_dedup():
    # repeated shingle content collapses (binary td_matrix semantics,
    # lsh.py:196-206: cell is 1 regardless of count)
    toks = ["a", "b", "a", "b", "a", "b"]
    s = _sets([toks], 2)[0]
    assert s == _sets([["a", "b", "a", "b"]], 2)[0]


def test_same_content_same_hashes_across_docs():
    s1, s2 = _sets([["x", "y", "z", "w"], ["x", "y", "z", "w"]], 2)
    assert s1 == s2


def test_short_doc_yields_empty():
    s = _sets([["a", "b"]], 5)
    assert s[0] == set()


def test_stride_subsamples():
    toks = [f"t{i}" for i in range(21)]
    full = _sets([toks], 5, stride=1)[0]
    strided = _sets([toks], 5, stride=2)[0]
    assert strided < full
    assert len(strided) == 9  # ceil(17/2)


def test_no_cross_document_windows():
    # windows must never span document boundaries
    a = ["p", "q", "r"]
    b = ["s", "t", "u"]
    joined = _sets([a + b], 3)[0]
    separate = _sets([a, b], 3)
    assert separate[0] | separate[1] < joined
    assert len(separate[0]) == 1 and len(separate[1]) == 1


def test_shingle_batch_drops_docs_below_k():
    cfg = PipelineConfig()
    batch = pa.table({
        "doc_id": pa.array([1, 2], type=pa.uint64()),
        "url": ["u1", "u2"],
        "text": ["one two three four five six", "too short"],
    })
    out = shingle_batch(batch, cfg)
    assert out.num_rows == 1
    assert out["doc_id"].to_pylist() == [1]


def test_tokenizer_lowercase_whitespace():
    s = tokenize_text_series(pd.Series(["Hello  World\nFoo", None]))
    assert s.iloc[0] == ["hello", "world", "foo"]
    assert s.iloc[1] == []
