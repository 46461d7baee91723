"""HTML → text extraction stage.

Stateless ``map_batches`` function over zero-copy Arrow batches.  The
extractor is the single canonical implementation (version-pinned by
being the only one): the per-row invariant from BASELINE.json's
input_hint is that the extracted text is **byte-identical** to the
page's original body text, per url.

Extraction contract: the body is the byte range between the first
``<main>`` and the following ``</main>`` marker, UTF-8 decoded.  Pages
without both markers yield empty text (counted, never dropped
silently — they flow through with text="").
"""

from __future__ import annotations

import pyarrow as pa

_OPEN = b"<main>"
_CLOSE = b"</main>"


def extract_text_from_html(html: bytes) -> str:
    start = html.find(_OPEN)
    if start < 0:
        return ""
    start += len(_OPEN)
    end = html.find(_CLOSE, start)
    if end < 0:
        return ""
    return html[start:end].decode("utf-8")


def extract_batch(batch: pa.Table) -> pa.Table:
    """(… html:binary …) → same table + ``text`` column (replaces any
    incoming ``text``) + drops ``html`` so downstream shuffles never
    carry the wide binary payload (SURVEY.md §7.5)."""
    htmls = batch.column("html").to_pylist()  # bytes.find is C-level
    texts = pa.array([extract_text_from_html(h) for h in htmls], type=pa.string())
    out = batch
    if "text" in out.column_names:
        out = out.drop_columns(["text"])
    out = out.append_column("text", texts)
    return out.drop_columns(["html"])
