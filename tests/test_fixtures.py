import pyarrow.parquet as pq

from lsh_ray.fixtures import generate_corpus


def test_corpus_deterministic():
    t1 = generate_corpus(n_docs=300, seed=42)
    t2 = generate_corpus(n_docs=300, seed=42)
    assert t1["documents"].equals(t2["documents"])
    assert t1["truth_pairs"].equals(t2["truth_pairs"])


def test_corpus_seed_sensitivity():
    t1 = generate_corpus(n_docs=300, seed=42)
    t2 = generate_corpus(n_docs=300, seed=43)
    assert not t1["documents"].equals(t2["documents"])


def test_corpus_planted_structure():
    t = generate_corpus(n_docs=1000, seed=42)
    kinds = set(t["truth_pairs"]["kind"].to_pylist())
    assert {"exact", "near", "substring"} <= kinds
    texts = t["documents"]["text"].to_pylist()
    assert any(x == "" or (x and x.strip() == "") for x in texts)  # empties
    urls = t["documents"]["url"].to_pylist()
    assert len(set(urls)) == len(urls)  # url is a primary key


def test_corpus_schema(tmp_path):
    import pyarrow as pa

    from lsh_ray.fixtures import write_corpus
    d = write_corpus(str(tmp_path), n_docs=100, seed=1, n_shards=2)
    docs = pq.read_table(d + "/documents")
    assert docs.schema.field("url").type == pa.string()
    assert docs.schema.field("warc_ts").type == pa.timestamp("us")
    assert docs.schema.field("html").type == pa.binary()
    assert docs.schema.field("text").type == pa.string()
    assert docs.schema.field("lang").type == pa.string()
