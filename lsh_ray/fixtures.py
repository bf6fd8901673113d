"""Deterministic synthetic web-page corpus with planted duplicate structure.

Generates the `documents` table of ``BASELINE.json.input_hint`` shape —
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)`` — plus ground-truth tables ``truth_pairs`` and
``truth_clusters`` (see FIXTURES.md §1). The planted structure exercises
every pipeline stage:

- exact-duplicate clusters (same text, 2-5 urls)  -> exact-hash pregroup
- near-duplicate clusters (mutation rates 1-20%)  -> MinHash/LSH S-curve
- substring-containment pairs                      -> suffix-array pass
- boilerplate header block in ~30% of docs         -> hot band keys (skew)
- empty / whitespace-only docs                     -> empty-doc filter
  (analog of the reference's empty-pitch-vector filter,
  ``json_manipulator.py:213``)

Everything derives from one ``numpy.random.default_rng(seed)`` stream; the
same (seed, n_docs) always produces byte-identical tables.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_VOCAB_SIZE = 10_000
_EPOCH_US = 1_577_836_800_000_000  # 2020-01-01 UTC in microseconds


def _make_vocab(rng: np.random.Generator) -> np.ndarray:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = set()
    out = []
    while len(out) < _VOCAB_SIZE:
        ln = int(rng.integers(3, 10))
        w = "".join(rng.choice(letters, size=ln))
        if w not in words:
            words.add(w)
            out.append(w)
    return np.array(out, dtype=object)


def _zipf_doc(rng: np.random.Generator, vocab: np.ndarray, n_tokens: int) -> list[str]:
    # Zipf-ish rank sampling over the vocabulary
    ranks = rng.zipf(1.3, size=n_tokens)
    idx = np.minimum(ranks - 1, _VOCAB_SIZE - 1)
    return list(vocab[idx])


def _mutate(rng: np.random.Generator, tokens: list[str], rate: float,
            vocab: np.ndarray) -> list[str]:
    """Token substitution / insertion / deletion at the given rate."""
    out: list[str] = []
    for t in tokens:
        r = rng.random()
        if r < rate / 3:
            continue  # deletion
        if r < 2 * rate / 3:
            out.append(str(vocab[rng.integers(0, _VOCAB_SIZE)]))  # substitution
            continue
        out.append(t)
        if r < rate:
            out.append(str(vocab[rng.integers(0, _VOCAB_SIZE)]))  # insertion
    return out if out else list(tokens)


def generate_corpus(n_docs: int = 5_000, seed: int = 42) -> dict[str, pa.Table]:
    """Build documents + truth_pairs + truth_clusters Arrow tables."""
    rng = np.random.default_rng(seed)
    vocab = _make_vocab(rng)
    boiler = " ".join(_zipf_doc(rng, vocab, 40))  # shared boilerplate header

    texts: list[str] = []
    langs: list[str] = []
    cluster_of: list[int] = []          # planted cluster id per doc (-1 = unique)
    kinds: list[tuple[int, int, str, float]] = []  # (i, j, kind, approx_jaccard)

    next_cluster = 0
    lang_pool = np.array(["en"] * 8 + ["pt", "de"], dtype=object)

    def add_doc(text: str, cid: int) -> int:
        texts.append(text)
        langs.append(str(lang_pool[rng.integers(0, len(lang_pool))]))
        cluster_of.append(cid)
        return len(texts) - 1

    while len(texts) < n_docs:
        roll = rng.random()
        use_boiler = rng.random() < 0.30
        n_tok = int(rng.integers(50, 2000))
        base_tokens = _zipf_doc(rng, vocab, n_tok)
        base_text = " ".join(base_tokens)
        if use_boiler:
            base_text = boiler + " " + base_text

        if roll < 0.60:  # unique background doc
            add_doc(base_text, -1)
        elif roll < 0.72:  # exact-duplicate cluster: 2-5 identical copies
            cid = next_cluster; next_cluster += 1
            size = int(rng.integers(2, 6))
            ids = [add_doc(base_text, cid) for _ in range(size)]
            for a in range(len(ids)):
                for b in range(a + 1, len(ids)):
                    kinds.append((ids[a], ids[b], "exact", 1.0))
        elif roll < 0.90:  # near-duplicate cluster at a mutation rate
            cid = next_cluster; next_cluster += 1
            rate = float(rng.choice([0.01, 0.05, 0.10, 0.20]))
            src_tokens = base_text.split(" ")
            i0 = add_doc(base_text, cid)
            size = int(rng.integers(1, 4))
            for _ in range(size):
                mut = _mutate(rng, src_tokens, rate, vocab)
                j = add_doc(" ".join(mut), cid)
                kinds.append((i0, j, "near", 1.0 - 2 * rate))
        elif roll < 0.96:  # substring containment: doc embedded in longer doc
            cid = next_cluster; next_cluster += 1
            inner = " ".join(_zipf_doc(rng, vocab, int(rng.integers(100, 400))))
            pre = " ".join(_zipf_doc(rng, vocab, int(rng.integers(50, 300))))
            post = " ".join(_zipf_doc(rng, vocab, int(rng.integers(50, 300))))
            i0 = add_doc(inner, cid)
            j = add_doc(pre + " " + inner + " " + post, cid)
            kinds.append((i0, j, "substring", 0.0))
        else:  # empty / whitespace-only rows (filtered by normalize)
            add_doc("" if rng.random() < 0.5 else "   ", -1)

    texts = texts[:n_docs]
    n = len(texts)
    urls = [
        f"https://site{int(rng.integers(0, 50))}.example/p{i // 100}/{i}"
        for i in range(n)
    ]
    ts = pa.array(
        (_EPOCH_US + np.arange(n, dtype=np.int64) * 1_000_000),
        type=pa.timestamp("us"),
    )
    html = [f"<html><body>{t}</body></html>".encode() for t in texts]

    documents = pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": ts,
        "html": pa.array(html, type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs[:n], type=pa.string()),
    })

    pairs = [(a, b, k, j) for (a, b, k, j) in kinds if a < n and b < n]
    truth_pairs = pa.table({
        "doc_a_url": pa.array([urls[a] for a, _, _, _ in pairs]),
        "doc_b_url": pa.array([urls[b] for _, b, _, _ in pairs]),
        "kind": pa.array([k for _, _, k, _ in pairs]),
        "true_jaccard": pa.array([j for _, _, _, j in pairs], type=pa.float32()),
    })
    truth_clusters = pa.table({
        "url": pa.array(urls),
        "cluster_id": pa.array(
            [cluster_of[i] if cluster_of[i] >= 0 else -1 for i in range(n)],
            type=pa.int64(),
        ),
    })
    return {
        "documents": documents,
        "truth_pairs": truth_pairs,
        "truth_clusters": truth_clusters,
    }


def write_corpus(out_dir: str, n_docs: int = 5_000, seed: int = 42,
                 n_shards: int = 4) -> str:
    """Write the corpus as sharded Parquet; returns ``out_dir``.

    Sharded so Ray Data gets multiple input blocks (parallel read) even at
    test scale — mirrors the 100 TB layout of one file per input partition.
    """
    os.makedirs(out_dir, exist_ok=True)
    tables = generate_corpus(n_docs=n_docs, seed=seed)
    docs = tables["documents"]
    doc_dir = os.path.join(out_dir, "documents")
    os.makedirs(doc_dir, exist_ok=True)
    shard = max(1, docs.num_rows // n_shards)
    for i in range(0, docs.num_rows, shard):
        pq.write_table(docs.slice(i, shard),
                       os.path.join(doc_dir, f"part-{i // shard:05d}.parquet"))
    pq.write_table(tables["truth_pairs"], os.path.join(out_dir, "truth_pairs.parquet"))
    pq.write_table(tables["truth_clusters"], os.path.join(out_dir, "truth_clusters.parquet"))
    return out_dir


def generate_sequences(n_seqs: int = 500, seed: int = 42) -> pa.Table:
    """Reference-shaped conformance fixture (FIXTURES.md §2): integer-valued
    float sequences with onsets/durations, mirroring the reference's pitch
    contour tuples (``loader.py:126``)."""
    rng = np.random.default_rng(seed)
    ids, values, onsets, durations = [], [], [], []
    for i in range(n_seqs):
        n = int(rng.integers(30, 600))
        vals = rng.integers(40, 80, size=n).astype(np.float32)  # MIDI-ish
        durs = rng.exponential(0.5, size=n).astype(np.float32) + 0.05
        # occasional null durations (reference emits None, loader.py:117)
        durs_list = durs.tolist()
        for j in rng.integers(0, n, size=max(1, n // 50)):
            durs_list[int(j)] = None
        ons = np.concatenate(([0.0], np.cumsum(durs[:-1]))).astype(np.float32)
        ids.append(f"seq://{i:05d}.mid")
        values.append(vals.tolist())
        onsets.append(ons.tolist())
        durations.append(durs_list)
    return pa.table({
        "doc_id": pa.array(ids),
        "values": pa.array(values, type=pa.list_(pa.float32())),
        "onsets": pa.array(onsets, type=pa.list_(pa.float32())),
        "durations": pa.array(durations, type=pa.list_(pa.float32())),
    })
