"""Document-corpus source dispatch — Parquet or JSONL behind one call.

Web-scale text corpora arrive as JSON Lines at least as often as
Parquet (Common-Crawl derivatives, chat exports, API dumps); the
curation CLI should ingest both without the user converting first.
``read_documents`` sniffs the format from the file extension and
returns the same column-pruned ``(doc_id, text, ...)`` Dataset either
way.

JSONL rides ``ray.data.read_json`` (Arrow's streaming JSON reader —
block-parallel over files; ``.jsonl.gz`` decompresses inline via the
Arrow filesystem layer).  Column pruning happens right after the read
(Arrow JSON has no column projection pushdown — the whole line must be
parsed anyway; the SELECT keeps everything downstream narrow).  A
missing required column raises immediately with the available names —
a schema error should fail the job at the read, not three stages later
inside a UDF.
"""

from __future__ import annotations

import os

import ray.data as rd

_JSONL_EXTS = (".jsonl", ".json", ".ndjson", ".jsonl.gz", ".json.gz", ".ndjson.gz")


def read_documents(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read a document corpus from Parquet (file or directory), JSONL or
    ORC, dispatching on extension; ``columns`` prunes every way."""
    lower = path.lower()
    if lower.endswith(".orc"):
        from .orc import read_orc

        return read_orc(path, columns=columns)
    if lower.endswith(_JSONL_EXTS):
        ds = rd.read_json(path)
        if columns:
            have = ds.schema().names
            missing = [c for c in columns if c not in have]
            if missing:
                raise ValueError(
                    f"jsonl corpus {path!r} lacks columns {missing}; has {have}"
                )
            ds = ds.select_columns(columns)
        return ds
    if columns:
        return rd.read_parquet(path, columns=columns)
    return rd.read_parquet(path)


def write_jsonl(ds: rd.Dataset, out_dir: str, **kwargs) -> str:
    """JSONL sink (one .json file per block — ray's native JSON writer,
    newline-delimited)."""
    os.makedirs(out_dir, exist_ok=True)
    ds.write_json(out_dir, **kwargs)
    return out_dir
