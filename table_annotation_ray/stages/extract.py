"""HTML → text extraction for web-corpus curation.

The first stage of every web-scale LLM data pipeline (WET-file / CCNet /
trafilatura territory): strip markup, decode entities, drop
script/style/head payloads, and optionally drop link-farm boilerplate
blocks by anchor-char density.  Stdlib-only (``html.parser``), like the
codec family in ``functions/codecs.py`` — no bs4/lxml/trafilatura in
this environment, and the plumbing (schema, batching, per-row error
degradation) is the deliverable; a real extractor plugs into
:func:`extract_html` 1:1.

Scale shape: extraction is embarrassingly parallel — one streaming
``map_batches`` pass, per-document stateful parse inside (an HTML parse
is genuinely sequential per document, like image decode; the batch
dimension is the vectorization).  Malformed HTML degrades per row
(``ok=False``), never poisons the batch.

Beyond-reference operator (no counterpart in
Orange-OpenSource/Table-Annotation; its sources are CSV/XLSX tables —
`file_loader.py` — not web documents).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
import pyarrow as pa

import ray.data as rd

# content inside these elements is never text
_SKIP = {"script", "style", "head", "title", "noscript", "template"}
# elements that terminate the current text block
_BLOCK = {
    "p", "div", "li", "ul", "ol", "br", "tr", "td", "th", "table",
    "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "aside",
    "header", "footer", "blockquote", "pre", "figure", "figcaption",
    "main", "nav", "hr",
}


class _Extractor(HTMLParser):
    """Collects block-level text runs + link/paragraph counts."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)  # entities decode in data
        self.blocks: list[tuple[str, int]] = []  # (text, anchor_chars)
        self._cur: list[str] = []
        self._cur_anchor_chars = 0
        self._skip_depth = 0
        self._anchor_depth = 0
        self.n_links = 0
        self.n_paragraphs = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip_depth += 1
            return
        if tag == "a":
            self._anchor_depth += 1
            if any(k == "href" for k, _ in attrs):
                self.n_links += 1
        if tag == "p":
            self.n_paragraphs += 1
        if tag in _BLOCK:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        if tag in _BLOCK:
            self._flush()

    def handle_data(self, data):
        if self._skip_depth:
            return
        self._cur.append(data)
        if self._anchor_depth:
            self._cur_anchor_chars += len(data)

    def _flush(self):
        txt = "".join(self._cur).strip()
        if txt:
            self.blocks.append((txt, self._cur_anchor_chars))
        self._cur = []
        self._cur_anchor_chars = 0


def extract_text(
    html: str,
    drop_link_blocks: bool = False,
    link_density: float = 0.5,
) -> tuple[str, int, int, int]:
    """Extract ``(text, n_links, n_paragraphs, n_blocks)`` from one HTML
    document.  Blocks (paragraph-level text runs) join with ``\\n``.
    With ``drop_link_blocks``, blocks whose anchor-char density exceeds
    ``link_density`` are dropped — the link-farm / nav-menu boilerplate
    heuristic (jusText-style)."""
    p = _Extractor()
    p.feed(html)
    p.close()
    p._flush()
    blocks = p.blocks
    if drop_link_blocks:
        blocks = [
            (t, a) for t, a in blocks if a <= link_density * max(1, len(t))
        ]
    return (
        "\n".join(t for t, _ in blocks),
        p.n_links,
        p.n_paragraphs,
        len(blocks),
    )


def extract_html(
    ds: rd.Dataset,
    html_col: str = "html",
    id_col: str = "doc_id",
    drop_link_blocks: bool = False,
    link_density: float = 0.5,
    batch_size: int = 4096,
) -> rd.Dataset:
    """Streaming HTML-extraction stage: one ``map_batches`` pass mapping
    each document to ``(id, text, n_links, n_paragraphs, n_blocks,
    ok)``.  Malformed rows degrade per document (``ok=False``, empty
    text) — the multimodal-decode error contract."""

    def run(b: pd.DataFrame) -> pa.Table:
        ids, texts, links, paras, blocks, oks = [], [], [], [], [], []
        for i, h in zip(b[id_col], b[html_col]):
            ids.append(i)
            try:
                t, nl, npar, nb = extract_text(
                    h if isinstance(h, str) else "",
                    drop_link_blocks=drop_link_blocks,
                    link_density=link_density,
                )
                texts.append(t)
                links.append(nl)
                paras.append(npar)
                blocks.append(nb)
                oks.append(True)
            except Exception:
                texts.append("")
                links.append(0)
                paras.append(0)
                blocks.append(0)
                oks.append(False)
        try:  # empty-batch type anchor (object dtype -> string)
            id_t = pa.from_numpy_dtype(b[id_col].dtype)
        except (pa.ArrowNotImplementedError, TypeError):
            id_t = pa.string()
        return pa.table(
            {
                id_col: pa.array(ids, id_t),
                "text": pa.array(texts, pa.string()),
                "n_links": pa.array(links, pa.int64()),
                "n_paragraphs": pa.array(paras, pa.int64()),
                "n_blocks": pa.array(blocks, pa.int64()),
                "ok": pa.array(oks, pa.bool_()),
            }
        )

    return ds.map_batches(run, batch_format="pandas", batch_size=batch_size)
