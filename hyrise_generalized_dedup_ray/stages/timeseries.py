"""Time-series operators: windowed aggregates, sessionization, as-of
join.

These are the event-stream operators a training-data pipeline needs
next to dedup (rate metrics per window, session construction for
behavioral corpora, as-of feature attachment).  The reference engine
has no window/as-of operators — its closest machinery is
AggregateHash's radix partitioning (aggregate_hash.cpp:260) and
JoinSortMerge's sorted-run merging (join_sort_merge.hpp:15-25); the
implementations below recast those shapes onto the hash exchange:

- **windows** are pure per-batch column derivations (tumbling) or a
  bounded ≤ size/hop explosion (hopping) followed by an ordinary
  grouped aggregate — no new shuffle primitive;
- **sessionize** hash-exchanges rows once on the entity key, then one
  vectorized per-partition kernel (lexsort + gap cumsum) emits whole
  sessions — the classic gap-based session window;
- **asof_join** unions both tagged sides through ONE exchange on the
  key, then a per-partition vectorized binary search (rank-packed
  (key, ts) searchsorted) attaches the latest right row at-or-before
  each left row — JoinSortMerge's sorted-merge per partition without a
  global sort.

Scale contract: one shuffle each, partitioned on the entity key; skew
on a hot key degrades one reduce (salt upstream if an entity exceeds a
partition's heap).  All kernels are numpy-vectorized; no per-row
Python.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from hyrise_generalized_dedup_ray.stages.exchange import hash_exchange

_I64 = pa.int64()


def _ts_us(batch: pa.Table, col: str) -> np.ndarray:
    return pc.cast(batch.column(col), _I64).to_numpy(zero_copy_only=False)


def add_tumbling_window(ds: Dataset, ts_col: str, every_us: int,
                        out_col: str = "win_start") -> Dataset:
    """Append the epoch-aligned tumbling-window start
    (``floor(ts/every)*every``) as a timestamp column.  SQL twin:
    ``make_timestamp((epoch_us(ts) // every) * every)``."""
    every = int(every_us)

    def fn(batch: pa.Table) -> pa.Table:
        t = _ts_us(batch, ts_col)
        ws = (t // every) * every
        return batch.append_column(
            out_col, pa.array(ws, type=_I64).cast(pa.timestamp("us")))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def add_hopping_windows(ds: Dataset, ts_col: str, size_us: int,
                        hop_us: int, out_col: str = "win_start") -> Dataset:
    """Explode each row into the ``size/hop`` hopping windows that
    contain it (window starts are hop-aligned:
    ``floor(ts/hop)*hop - j*hop`` for ``j in [0, size/hop)``), appending
    the window start.  ``size`` must be a multiple of ``hop``.  The
    fan-out is bounded by size/hop, applied before the grouped
    aggregate — the aggregate's shuffle then moves pre-reduced rows."""
    size, hop = int(size_us), int(hop_us)
    if size % hop:
        raise ValueError("hopping window size must be a multiple of hop")
    k = size // hop

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        t = _ts_us(batch, ts_col)
        base = (t // hop) * hop
        idx = np.repeat(np.arange(n), k)
        ws = base[idx] - np.tile(np.arange(k, dtype=np.int64) * hop, n)
        return batch.take(pa.array(idx)).append_column(
            out_col, pa.array(ws, type=_I64).cast(pa.timestamp("us")))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def sessionize(ds: Dataset, key_col: str, ts_col: str, gap_us: int,
               sum_col: str | None = None, tiebreak_col: str | None = None,
               num_partitions: int | None = None) -> Dataset:
    """Gap-based session windows: per ``key_col`` entity, rows sorted
    by time belong to one session until a gap > ``gap_us`` starts the
    next.  Emits one row per session: key, session_start, session_end,
    n_events (+ sum_<sum_col>).  One hash exchange on the key, then a
    vectorized lexsort + gap-cumsum + reduceat kernel per partition —
    no per-row Python, no global sort."""
    gap = int(gap_us)
    cols = [key_col, ts_col] + ([sum_col] if sum_col else []) \
        + ([tiebreak_col] if tiebreak_col else [])
    proj = ds.select_columns(cols)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    P = num_partitions or max(2, cpus)
    schema = pa.schema(
        [(key_col, _I64), ("__ts", _I64)]
        + ([("__v", pa.float64())] if sum_col else [])
        + ([("__tb", _I64)] if tiebreak_col else []))

    def map_fn(batch: pa.Table) -> pa.Table:
        arrs = [pc.cast(batch.column(key_col), _I64),
                pa.array(_ts_us(batch, ts_col), type=_I64)]
        if sum_col:
            arrs.append(pc.cast(batch.column(sum_col), pa.float64()))
        if tiebreak_col:
            arrs.append(pc.cast(batch.column(tiebreak_col), _I64))
        return pa.Table.from_arrays(arrs, schema=schema)

    def kernel(t: pa.Table) -> pa.Table:
        out_fields = [(key_col, _I64),
                      ("session_start", pa.timestamp("us")),
                      ("session_end", pa.timestamp("us")),
                      ("n_events", _I64)] \
            + ([(f"sum_{sum_col}", pa.float64())] if sum_col else [])
        if t.num_rows == 0:
            return pa.schema(out_fields).empty_table()
        key = t.column(key_col).to_numpy(zero_copy_only=False)
        ts = t.column("__ts").to_numpy(zero_copy_only=False)
        sort_keys = [ts, key]
        if tiebreak_col:
            sort_keys.insert(0, t.column("__tb").to_numpy(
                zero_copy_only=False))
        order = np.lexsort(sort_keys)
        key, ts = key[order], ts[order]
        new_entity = np.empty(len(key), dtype=bool)
        new_entity[0] = True
        new_entity[1:] = key[1:] != key[:-1]
        brk = new_entity.copy()
        brk[1:] |= (ts[1:] - ts[:-1]) > gap
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [len(key)]])
        arrs = [pa.array(key[starts], type=_I64),
                pa.array(ts[starts], type=_I64).cast(pa.timestamp("us")),
                pa.array(ts[ends - 1], type=_I64).cast(pa.timestamp("us")),
                pa.array(ends - starts, type=_I64)]
        if sum_col:
            v = t.column("__v").to_numpy(zero_copy_only=False)[order]
            arrs.append(pa.array(np.add.reduceat(v, starts),
                                 type=pa.float64()))
        return pa.Table.from_arrays(arrs, schema=pa.schema(out_fields))

    return hash_exchange(proj, map_fn, key_col, kernel, P, schema)


def asof_join(left: Dataset, right: Dataset, key_col: str, ts_col: str,
              right_id_col: str, right_cols: Sequence[str],
              prefix: str = "b_",
              num_partitions: int | None = None) -> Dataset:
    """As-of LEFT join: for each left row, attach ``right_cols`` from
    the LATEST right row with the same key and ``right.ts <= left.ts``;
    ties on ts break by the largest ``right_id_col`` (deterministic);
    unmatched left rows keep nulls.  SQL twin: LEFT JOIN + QUALIFY
    ROW_NUMBER() OVER (PARTITION BY left row ORDER BY b.ts DESC,
    b.id DESC) = 1.  ``key_col``, ``ts_col`` and ``right_id_col`` must
    be non-null (int64/timestamp).

    Both tagged sides flow through ONE hash exchange on the key; the
    per-partition kernel rank-packs (key, ts) into one int64 and
    resolves every left row with a single vectorized
    ``np.searchsorted`` over the sorted right rows — JoinSortMerge's
    merge step (join_sort_merge.hpp:15-25) without the global sort."""
    from hyrise_generalized_dedup_ray.stages.exchange import _pa_schema

    rc = list(right_cols)
    if right_id_col not in rc:
        rc = [right_id_col] + rc

    # union the two tagged sides so ONE exchange co-locates them
    lsel = left
    rsel = right.select_columns(
        list(dict.fromkeys([key_col, ts_col] + rc)))
    cpus = int(ray.cluster_resources().get("CPU", 8))
    P = num_partitions or max(2, cpus)

    lpa, rpa = _pa_schema(lsel), _pa_schema(rsel)
    l_names = list(lpa.names)
    mid_fields = ([("__side", _I64), (key_col, _I64), ("__ts", _I64),
                   ("__rid", _I64)]
                  + [(f"__l_{c}", lpa.field(c).type)
                     for c in l_names if c != key_col]
                  + [(f"__r_{c}", rpa.field(c).type) for c in rc])
    mid_schema = pa.schema(mid_fields)

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            rid = (pc.cast(batch.column(right_id_col), _I64) if side == 1
                   else pa.nulls(n, type=_I64).fill_null(0))
            arrs = [pa.array(np.full(n, side, dtype=np.int64), type=_I64),
                    pc.cast(batch.column(key_col), _I64),
                    pa.array(_ts_us(batch, ts_col), type=_I64), rid]
            for name, typ in mid_fields[4:]:
                src = name[4:]
                if (side == 0 and name.startswith("__l_")) or \
                        (side == 1 and name.startswith("__r_")):
                    arrs.append(pc.cast(batch.column(src), typ))
                else:
                    arrs.append(pa.nulls(n, type=typ))
            return pa.Table.from_arrays(arrs, schema=mid_schema)
        return fn

    tagged = lsel.map_batches(tag(0), batch_format="pyarrow",
                              zero_copy_batch=True).union(
        rsel.map_batches(tag(1), batch_format="pyarrow",
                         zero_copy_batch=True))

    out_fields = ([(c, mid_schema.field(f"__l_{c}").type)
                   for c in l_names if c != key_col]
                  + [(key_col, _I64)]
                  + [(prefix + c, mid_schema.field(f"__r_{c}").type)
                     for c in rc])
    out_schema = pa.schema(out_fields)

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        side = t.column("__side").to_numpy(zero_copy_only=False)
        key = t.column(key_col).to_numpy(zero_copy_only=False)
        ts = t.column("__ts").to_numpy(zero_copy_only=False)
        rid = t.column("__rid").to_numpy(zero_copy_only=False)
        # rank-pack (key, ts) → one sortable int64 per row (ranks keep
        # the product far below 2**63 even for 10^7-row partitions)
        _, krank = np.unique(key, return_inverse=True)
        _, trank = np.unique(ts, return_inverse=True)
        K = np.int64(trank.max() + 2)
        packed = krank.astype(np.int64) * K + trank.astype(np.int64)
        is_r = side == 1
        r_idx = np.flatnonzero(is_r)
        l_idx = np.flatnonzero(~is_r)
        if len(l_idx) == 0:
            return out_schema.empty_table()
        if len(r_idx) == 0:
            matched = np.zeros(len(l_idx), dtype=bool)
            take_r = np.zeros(len(l_idx), dtype=np.int64)
        else:
            # sort right rows by (key, ts, id): searchsorted('right')-1
            # lands on the LAST tie = the largest id (deterministic)
            r_order = r_idx[np.lexsort((rid[r_idx], packed[r_idx]))]
            r_packed = packed[r_order]
            pos = np.searchsorted(r_packed, packed[l_idx],
                                  side="right") - 1
            pos_c = np.maximum(pos, 0)
            matched = (pos >= 0) & (krank[r_order][pos_c] == krank[l_idx])
            take_r = np.where(matched, r_order[pos_c], 0)
        arrs = []
        lt = pa.array(l_idx)
        for c in l_names:
            if c == key_col:
                continue
            arrs.append(t.column(f"__l_{c}").take(lt))
        arrs.append(t.column(key_col).take(lt))
        rt = pa.array(np.where(matched, take_r, 0))
        mask = pa.array(~matched)
        for c in rc:
            col = t.column(f"__r_{c}").take(rt)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            arrs.append(pc.if_else(mask, pa.nulls(len(l_idx),
                                                  type=col.type), col))
        return pa.Table.from_arrays(arrs, schema=out_schema)

    return hash_exchange(tagged, lambda b: b, key_col, kernel, P,
                         mid_schema)
