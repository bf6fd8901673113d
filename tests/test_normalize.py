import pyarrow as pa
import pytest

from lsh_ray.stages.normalize import extract_text_from_html, normalize_batch


def _batch(**cols):
    return pa.table(cols)


def test_text_passes_through_byte_identical():
    # THE per-row invariant (BASELINE.json): byte-identical text per url
    text = "Hello   World éè  unchanged\t"
    b = _batch(url=["https://a/x"], text=[text], lang=["en"])
    out = normalize_batch(b)
    assert out["text"][0].as_py() == text


def test_doc_id_is_content_derived_and_stable():
    b = _batch(url=["https://a/x", "https://a/y"], text=["t1", "t2"],
               lang=["en", "en"])
    out1 = normalize_batch(b)
    # reordering rows must not change any doc's id (fixes the reference's
    # positional-identity fragility, lsh.py:263, lsh.py:462-463)
    b_rev = b.take([1, 0])
    out2 = normalize_batch(b_rev)
    m1 = dict(zip(out1["url"].to_pylist(), out1["doc_id"].to_pylist()))
    m2 = dict(zip(out2["url"].to_pylist(), out2["doc_id"].to_pylist()))
    assert m1 == m2


def test_empty_and_whitespace_docs_dropped():
    b = _batch(url=["u1", "u2", "u3", "u4"],
               text=["real content", "", "   ", None],
               lang=["en"] * 4)
    out = normalize_batch(b)
    assert out["url"].to_pylist() == ["u1"]


def test_html_extraction_when_text_missing():
    html = b"<html><body><p>Hello <b>world</b></p></body></html>"
    b = _batch(url=["u1"], html=[html])
    out = normalize_batch(b)
    assert out["text"][0].as_py() == "Hello world"


def test_html_extraction_deterministic():
    html = b"<div>a</div><div>b</div>"
    assert extract_text_from_html(html) == extract_text_from_html(html) == "a b"


def test_testdata_shape_gets_synthetic_url():
    b = _batch(doc_id=pa.array([7], pa.int64()), text=["some text"],
               lang=["en"])
    out = normalize_batch(b)
    assert out["url"][0].as_py() == "doc://7"
    assert out.schema.field("doc_id").type == pa.uint64()
