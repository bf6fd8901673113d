"""Sources: read the corpus tables into canonical Datasets.

Rebuild of the reference's loader/serialization layer (SURVEY.md §2.1
S1-S17): the reference hand-rolls JSON shard files + manifests
(``json_manipulator.py:84-192``); here Parquet + Ray Data give sharding,
schema, and parallel reads for free. Column pruning happens AT THE READ
(``columns=[...]``) so a 2-column transform never lifts the html payload
off storage.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def strip_schema_metadata(ds):
    """Drop schema-level metadata (e.g. the ``pandas`` key parquet writers
    embed). Schemas with metadata are UNHASHABLE in pyarrow, which defeats
    Ray Data's schema-dedup fast path and spams warnings when
    metadata-carrying blocks meet metadata-free ones; fuses with the next
    map stage, zero-copy."""
    import pyarrow as _pa

    return ds.map_batches(lambda t: t.replace_schema_metadata(None),
                          batch_format="pyarrow", zero_copy_batch=True)


def read_documents(path: str | list[str], columns: list[str] | None = None,
                   lang: str | None = None, limit: int | None = None,
                   override_num_blocks: int | None = None):
    """Read a documents table (web shape or testdata shape) from Parquet.

    - ``lang``: row-group-pushdown language filter (reference analog:
      skip-list predicate, ``loader.py:148-154``)
    - ``limit``: corpus truncation (reference: ``--num_audios``,
      ``main.py:144-153``)
    """
    import pyarrow.compute as pc
    kwargs = {}
    if columns:
        kwargs["columns"] = columns
    if lang:
        kwargs["filter"] = pc.field("lang") == lang
    if override_num_blocks:
        kwargs["override_num_blocks"] = override_num_blocks
    ds = strip_schema_metadata(ray.data.read_parquet(path, **kwargs))
    if limit:
        ds = ds.limit(limit)
    return ds


def read_documents_for_dedup(path: str | list[str],
                             override_num_blocks: int | None = None):
    """Metadata-planned projection for the dedup pipeline read.

    The pipeline consumes (url, text, lang); the heavy ``html`` payload
    (half the bytes of a CC-style table) is consulted ONLY as normalize's
    extraction fallback for rows with NULL ``text``. Parquet column
    statistics prove per-file whether such rows exist: when every file
    reports ``null_count == 0`` for ``text``, the read skips ``html``
    (and ``warc_ts``, which normalize drops) entirely. Files without
    statistics, or with any null text, keep the full column set — the
    plan is always correct, just sometimes un-pruned.
    """
    import glob as _glob
    import os as _os

    paths = [path] if isinstance(path, str) else list(path)
    files: list[str] = []
    for p in paths:
        if _os.path.isdir(p):
            # scan the SAME file set the read consumes: ray.data
            # read_parquet (file_extensions=None) reads every regular
            # file under the directory, not just *.parquet — a parquet
            # file with a different extension must not escape the
            # null-count check (its null-text rows would be silently
            # dropped by a pruned read). Unscannable files make
            # _dedup_read_columns fall back to the full column set.
            files.extend(sorted(
                f for f in _glob.glob(_os.path.join(p, "**", "*"),
                                      recursive=True)
                if _os.path.isfile(f)))
        else:
            files.append(p)
    try:
        key = tuple((f, _os.path.getmtime(f), _os.path.getsize(f))
                    for f in files)
    except OSError:
        key = tuple((f, 0.0, -1) for f in files)
    columns = _dedup_read_columns(tuple(files), key)
    return read_documents(path, columns=columns,
                          override_num_blocks=override_num_blocks)


_DEDUP_COLUMNS_CACHE: dict[tuple, list[str] | None] = {}


def _dedup_read_columns(files: tuple[str, ...], key: tuple
                        ) -> list[str] | None:
    """Metadata scan behind ``read_documents_for_dedup``: the pruned
    column list, or None for the full read. Footers are read in a thread
    pool (driver-side serial I/O otherwise bills O(n_files) round trips
    to every caller — bench re-invokes per repeat) and the verdict is
    cached per (file, mtime, size) list."""
    if key in _DEDUP_COLUMNS_CACHE:
        return _DEDUP_COLUMNS_CACHE[key]

    import pyarrow.parquet as _pq

    def _file_verdict(f: str):
        """(prunable, schema names) for one file."""
        md = _pq.ParquetFile(f).metadata
        names = md.schema.names
        if "text" not in names or "html" not in names:
            return False, names
        ti = names.index("text")
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ti).statistics
            if st is None or st.null_count is None or st.null_count > 0:
                return False, names
        return True, names

    columns: list[str] | None = None
    try:
        if files:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=min(16, len(files))) as ex:
                verdicts = list(ex.map(_file_verdict, files))
            if all(ok for ok, _ in verdicts):
                # intersect schemas: a column kept by the projection must
                # exist in EVERY file or the pruned read raises KeyError
                # on the file that lacks it (heterogeneous corpora)
                common = set(verdicts[0][1])
                for _, names in verdicts[1:]:
                    common &= set(names)
                keep = {"url", "text", "lang", "doc_id"}
                columns = [c for c in verdicts[0][1]
                           if c in keep and c in common]
                if not columns:
                    columns = None
    except Exception:
        columns = None
    _DEDUP_COLUMNS_CACHE[key] = columns
    return columns


def read_text_documents(paths: str | list[str]):
    """Plain text files -> (url, text) rows (one doc per line).

    Reference analog: newline dataset lists, ``loader.py:44-52``.

    Each file is read whole (one row) and split into lines HERE, so the
    line number is known globally and ``url = "text://{path}#L{lineno}"``
    is unique across files and blocks. (A per-batch row counter would
    restart at 0 in every block and silently collide distinct documents
    into one ``doc_id = siphash64(url)`` downstream.)
    """
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def to_docs(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        texts: list[str] = []
        for path, blob in zip(t["path"].to_pylist(),
                              t["bytes"].to_pylist()):
            lines = blob.decode("utf-8", errors="replace").splitlines()
            urls.extend(f"text://{path}#L{i}" for i in range(len(lines)))
            texts.extend(lines)
        return pa.table({"url": pa.array(urls, type=pa.string()),
                         "text": pa.array(texts, type=pa.string())})
    return ds.map_batches(to_docs, batch_format="pyarrow")


def read_binary_documents(paths: str | list[str]):
    """Binary payload files (images / audio / MIDI scores / any crawl
    blob) -> (doc_id, payload, mime) rows — the ingestion the
    multimodal family (``BinaryDecodeStage``, ``MidiParseStage``)
    consumes. Reference analog: the song-directory walk feeding its
    loaders (``loader.py:37-52``, MIDI_SONGS_PATH listing).

    ``doc_id = "file://{path}"`` (content location, stable across
    re-runs); ``mime`` is a cheap extension guess — decode stages
    dispatch on MAGIC BYTES, never on this hint."""
    ds = ray.data.read_binary_files(paths, include_paths=True)
    mime_by_ext = {"jpg": "image/jpeg", "jpeg": "image/jpeg",
                   "png": "image/png", "bmp": "image/bmp",
                   "wav": "audio/wav", "mp1": "audio/mpeg",
                   "mp3": "audio/mpeg", "mid": "audio/midi",
                   "midi": "audio/midi"}

    def to_docs(t: pa.Table) -> pa.Table:
        paths_l = t["path"].to_pylist()
        return pa.table({
            "doc_id": pa.array([f"file://{p}" for p in paths_l],
                               type=pa.string()),
            "payload": t["bytes"],
            "mime": pa.array(
                [mime_by_ext.get(p.rsplit(".", 1)[-1].lower(),
                                 "application/octet-stream")
                 for p in paths_l], type=pa.string()),
        })
    return ds.map_batches(to_docs, batch_format="pyarrow",
                          zero_copy_batch=True)


def read_json_documents(paths: str | list[str],
                        url_field: str = "url",
                        text_field: str = "text"):
    """JSON-lines files -> (url, text[, ...]) rows.

    Reference analog: the JSON shard files its serializer emits
    (``json_manipulator.py:84-192``); here Ray's parallel JSON reader +
    a rename/prune map. Extra fields are preserved."""
    ds = ray.data.read_json(paths)

    def canon(t: pa.Table) -> pa.Table:
        cols = {}
        for name in t.column_names:
            out = ("url" if name == url_field
                   else "text" if name == text_field else name)
            cols[out] = t[name]
        return pa.table(cols)
    return ds.map_batches(canon, batch_format="pyarrow",
                          zero_copy_batch=True)


def read_csv_documents(paths: str | list[str],
                       url_field: str = "url",
                       text_field: str = "text"):
    """CSV files -> (url, text[, ...]) rows (parallel CSV reader)."""
    ds = ray.data.read_csv(paths)

    def canon(t: pa.Table) -> pa.Table:
        cols = {}
        for name in t.column_names:
            out = ("url" if name == url_field
                   else "text" if name == text_field else name)
            cols[out] = t[name]
        return pa.table(cols)
    return ds.map_batches(canon, batch_format="pyarrow",
                          zero_copy_batch=True)


_FORMAT_READERS = {
    "parquet": read_documents,
    "text": read_text_documents,
    "json": read_json_documents,
    "csv": read_csv_documents,
    "binary": read_binary_documents,
}


def read_any(path: str | list[str], format: str | None = None, **kwargs):
    """Format-dispatch reader (reference S9 analog: dataset-kind dispatch,
    ``loader.py:129-166``). ``format`` None infers from the extension."""
    if format is None:
        p = path[0] if isinstance(path, list) else path
        ext = p.rsplit(".", 1)[-1].lower()
        format = {"pq": "parquet", "jsonl": "json", "txt": "text",
                  "tsv": "csv", **{e: "binary" for e in (
                      "mid", "midi", "png", "jpg", "jpeg", "bmp",
                      "wav", "mp1", "mp3", "bin")}}.get(ext, ext)
    try:
        reader = _FORMAT_READERS[format]
    except KeyError:
        raise ValueError(f"unsupported format {format!r}; "
                         f"one of {sorted(_FORMAT_READERS)}") from None
    return reader(path, **kwargs)


def write_partitioned(ds, out_dir: str, min_rows_per_file: int | None = None):
    """Partitioned Parquet sink (a directory of part files — resumable
    layout; never one giant file)."""
    kwargs = {}
    if min_rows_per_file:
        kwargs["min_rows_per_file"] = min_rows_per_file
    ds.write_parquet(out_dir, **kwargs)
    return out_dir
