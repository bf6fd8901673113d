"""Source readers: format dispatch (S9), text/json/csv ingestion, and
the globally-unique-url contract of the line reader."""

import json
import os

import pytest


@pytest.fixture(scope="module")
def rd(ray_session, tmp_path_factory):
    import ray.data
    return ray.data


def test_read_text_documents_unique_urls(rd, tmp_path):
    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    a.write_text("alpha one\nbeta two\n")
    b.write_text("gamma three\nalpha one\n")  # duplicate CONTENT across files
    from lsh_ray.sources.readers import read_text_documents
    rows = read_text_documents([str(a), str(b)]).take_all()
    urls = [r["url"] for r in rows]
    assert len(rows) == 4
    assert len(set(urls)) == 4, "urls must be globally unique"
    assert all(u.startswith("text://") and "#L" in u for u in urls)


def test_read_json_documents(rd, tmp_path):
    p = tmp_path / "docs.jsonl"
    with open(p, "w") as f:
        for i in range(3):
            f.write(json.dumps({"page": f"http://x/{i}",
                                "body": f"doc {i}", "lang": "en"}) + "\n")
    from lsh_ray.sources.readers import read_json_documents
    out = read_json_documents(str(p), url_field="page",
                              text_field="body").take_all()
    assert {r["url"] for r in out} == {f"http://x/{i}" for i in range(3)}
    assert all("text" in r and "lang" in r for r in out)


def test_read_csv_documents(rd, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text("url,text\nhttp://a,hello world\nhttp://b,second doc\n")
    from lsh_ray.sources.readers import read_csv_documents
    out = read_csv_documents(str(p)).take_all()
    assert {r["url"] for r in out} == {"http://a", "http://b"}


def test_read_any_dispatch(rd, tmp_path):
    from lsh_ray.sources.readers import read_any
    p = tmp_path / "d.jsonl"
    p.write_text(json.dumps({"url": "u", "text": "t"}) + "\n")
    assert read_any(str(p)).take_all()[0]["url"] == "u"
    t = tmp_path / "d.txt"
    t.write_text("one line\n")
    assert read_any(str(t)).take_all()[0]["text"] == "one line"
    with pytest.raises(ValueError, match="unsupported format"):
        read_any("whatever.xyz")


def test_read_documents_parquet_pruned(rd, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    p = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": [1, 2], "text": ["a", "b"], "lang": ["en", "pt"],
        "html": [b"<x>", b"<y>"]}), p)
    from lsh_ray.sources.readers import read_documents
    ds = read_documents(str(p), columns=["doc_id", "text"])
    rows = ds.take_all()
    assert set(rows[0].keys()) == {"doc_id", "text"}
    ds2 = read_documents(str(p), lang="en")
    assert [r["doc_id"] for r in ds2.take_all()] == [1]


def test_read_documents_for_dedup_metadata_projection(rd, tmp_path):
    """html is skipped at the read iff parquet statistics prove text is
    never null; a null-text corpus keeps html so normalize can extract."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lsh_ray.sources.readers import read_documents_for_dedup
    d = tmp_path / "corpus"
    d.mkdir()
    full = pa.table({
        "url": ["u1", "u2"],
        "warc_ts": pa.array([1, 2], pa.timestamp("us")),
        "html": [b"<html><body>from html</body></html>", b"<x>y</x>"],
        "text": pa.array(["plain text", None], pa.string()),
        "lang": ["en", "en"],
    })
    pq.write_table(full, d / "a.parquet")
    ds = read_documents_for_dedup(str(d))
    assert "html" in ds.schema().names
    from lsh_ray.stages.normalize import normalize
    out = sorted(r["text"] for r in normalize(ds, None).take_all())
    assert out == ["plain text", "y"]  # null text extracted from html

    pq.write_table(
        full.set_column(3, "text", pa.array(["a b c", "d e f"])),
        d / "a.parquet")
    ds2 = read_documents_for_dedup(str(d))
    assert set(ds2.schema().names) == {"url", "text", "lang"}


def test_read_documents_for_dedup_heterogeneous_schemas(rd, tmp_path):
    """Files with different column sets must not crash the pruned read:
    the projection keeps only columns present in EVERY file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lsh_ray.sources.readers import read_documents_for_dedup
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(pa.table({
        "url": ["u1"], "html": [b"<x>"],
        "text": pa.array(["a b"], pa.string())}), d / "a.parquet")
    pq.write_table(pa.table({
        "url": ["u2"], "html": [b"<y>"],
        "text": pa.array(["c d"], pa.string()),
        "lang": ["en"]}), d / "b.parquet")
    ds = read_documents_for_dedup(str(d))
    rows = ds.take_all()
    assert len(rows) == 2
    assert {"url", "text"} <= set(rows[0].keys())


def test_read_binary_documents_from_disk(ray_session, tmp_path):
    """Directory of binary payload files -> (doc_id, payload, mime)
    rows, straight into the multimodal parse stages (the reference's
    song-directory ingestion, loader.py:37-52)."""
    from lsh_ray.sources.readers import read_any, read_binary_documents
    from lsh_ray.stages.midi import MidiParseStage, encode_smf

    d = tmp_path / "songs"
    d.mkdir()
    for i in range(3):
        notes = [(j * 240, 240, 50 + ((i * 7 + j) % 20), 80, 0)
                 for j in range(30)]
        (d / f"song{i}.mid").write_bytes(encode_smf([notes]))
    (d / "junk.bin").write_bytes(b"not midi at all")

    ds = read_binary_documents(str(d))
    out = ds.map_batches(MidiParseStage, concurrency=1,
                         batch_format="pyarrow").to_pandas()
    assert len(out) == 4
    assert out.ok.sum() == 3 and (~out.ok).sum() == 1
    parsed = out[out.ok]
    assert all(did.startswith("file://") and did.endswith(".mid")
               for did in parsed.doc_id)
    assert (parsed.n_notes == 30).all()
    # mime is an extension hint only; dispatch happened on magic bytes
    mimes = dict(zip(out.doc_id, ds.to_pandas().set_index(
        "doc_id").loc[out.doc_id, "mime"]))
    assert sum(m == "audio/midi" for m in mimes.values()) == 3

    # read_any extension dispatch routes .mid to the binary reader
    ds2 = read_any(str(d / "song0.mid"))
    assert ds2.count() == 1 and "payload" in ds2.schema().names
