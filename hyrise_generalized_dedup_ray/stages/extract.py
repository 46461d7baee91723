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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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


def _extract_texts(col: pa.Array) -> pa.Array:
    """Vectorized marker extraction: two ``pc.find_substring`` passes
    locate the byte ranges, one CSR gather copies them out of the
    binary column's data buffer, and a cast validates utf-8 — no
    Python ``bytes`` objects on the hot path.  The rare row whose
    first ``</main>`` occurrence precedes its ``<main>`` falls back to
    the scalar reference form (``extract_text_from_html``, which stays
    the semantics oracle)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return pa.array([], type=pa.string())
    opens = pc.find_substring(col, pattern=_OPEN)
    closes = pc.find_substring(col, pattern=_CLOSE)
    op = pc.fill_null(opens, -1).to_numpy(zero_copy_only=False).astype(np.int64)
    cl = pc.fill_null(closes, -1).to_numpy(zero_copy_only=False).astype(np.int64)

    off_dt = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    bufs = col.buffers()
    row_off = np.frombuffer(bufs[1], dtype=off_dt)[
        col.offset: col.offset + n + 1].astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, dtype=np.uint8))

    ok = (op >= 0) & (cl >= op + len(_OPEN))
    starts = np.where(ok, row_off[:-1] + op + len(_OPEN), 0)
    ends = np.where(ok, row_off[:-1] + cl, 0)
    # rows whose first close precedes the open need a positioned
    # re-search (html.find(_CLOSE, start)) — scalar fallback
    retry = np.flatnonzero((op >= 0) & (cl >= 0) & ~ok)
    for i in retry:
        html = col[int(i)].as_py()
        start = int(op[i]) + len(_OPEN)
        end = html.find(_CLOSE, start)
        if end >= 0:
            starts[i] = row_off[i] + start
            ends[i] = row_off[i] + end
            ok[i] = True

    lens = ends - starts
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    total = int(out_off[-1])
    if total:
        idx = np.arange(total, dtype=np.int64) + np.repeat(
            starts - out_off[:-1], lens)
        flat = data[idx]
    else:
        flat = np.empty(0, dtype=np.uint8)
    binary = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(flat.tobytes())])
    # cast validates utf-8, like the reference form's .decode()
    return pc.cast(binary, pa.large_string())


def extract_batch(batch: pa.Table) -> pa.Table:
    """(… html:binary …) → same table + ``text`` column (replaces any
    incoming ``text``) + drops ``html`` so downstream shuffles never
    carry the wide binary payload (SURVEY.md §7.5)."""
    texts = _extract_texts(batch.column("html"))
    out = batch
    if "text" in out.column_names:
        out = out.drop_columns(["text"])
    out = out.append_column("text", texts)
    return out.drop_columns(["html"])
