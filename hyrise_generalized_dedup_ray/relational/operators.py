"""Relational operators as Dataset builders (SURVEY.md §2.2–2.8).

Each builder is the Ray-Data recast of one reference operator; the
docstring cites the reference file it matches.  Conventions:

- narrow per-batch work runs on zero-copy Arrow
  (``batch_format="pyarrow", zero_copy_batch=True``);
- wide work (groupby/sort/join) delegates to Ray's hash-shuffle
  operators — ONE shuffle per wide op, keyed as documented;
- "broadcast" variants assume the small side fits one worker's heap
  (the 100 TB-scale replacement for shuffling a dimension table:
  ``ray.put`` once, read once per actor in ``__init__``).
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Mean, Min, Std, Sum

from hyrise_generalized_dedup_ray.relational.expressions import Expr, col


# --------------------------------------------------------------------------
# scans / maps / projections (§2.2)
# --------------------------------------------------------------------------

def table_scan(ds: Dataset, predicate: Expr) -> Dataset:
    """TableScan (table_scan.hpp:20): filter by one predicate expression.

    The expression compiles to pc kernels; the whole scan is a stateless
    ``map_batches`` with a boolean mask — the per-chunk parallel scan of
    the reference becomes per-block parallelism for free."""

    def scan(batch: pa.Table) -> pa.Table:
        mask = predicate(batch)
        if isinstance(mask, pa.ChunkedArray):
            mask = mask.combine_chunks()
        return batch.filter(mask)

    return ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)


def projection(
    ds: Dataset,
    exprs: dict[str, Expr | str],
    keep: Sequence[str] | None = None,
) -> Dataset:
    """Projection (projection.hpp:23): compute expression list → columns.

    ``exprs`` maps output name → Expr (or input column name for a plain
    forward/rename).  ``keep`` lists pass-through columns (zero-copy
    forwarding, free on Arrow batches — the reference forwards by
    reference-segment, projection.hpp comment)."""
    compiled = {
        name: (col(e) if isinstance(e, str) else e) for name, e in exprs.items()
    }

    def project(batch: pa.Table) -> pa.Table:
        cols: dict[str, Any] = {}
        for k in (keep or []):
            cols[k] = batch.column(k)
        for name, e in compiled.items():
            out = e(batch)
            if isinstance(out, pa.Scalar):  # literal-only projection
                out = pa.repeat(out, len(batch))  # pragma: no cover
            cols[name] = out
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def alias(ds: Dataset, mapping: dict[str, str]) -> Dataset:
    """AliasOperator (alias_operator.hpp:11): rename columns."""

    def rn(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([mapping.get(c, c) for c in batch.column_names])

    return ds.map_batches(rn, batch_format="pyarrow", zero_copy_batch=True)


def limit(ds: Dataset, n: int) -> Dataset:
    """Limit (limit.hpp:12)."""
    return ds.limit(n)


# --------------------------------------------------------------------------
# sort / top-k (§2.7)
# --------------------------------------------------------------------------

def sort(ds: Dataset, keys: Sequence[str], descending: Sequence[bool] | bool = False) -> Dataset:
    """Sort (sort.hpp:17-30).  Ray's sort is a range-partition shuffle
    and is NOT stable — callers needing the reference's stability add a
    tiebreak column (SURVEY.md §2.7)."""
    return ds.sort(list(keys), descending=descending)


def top_k(ds: Dataset, key: str, k: int, descending: bool = True,
          tiebreak: str | None = None) -> Dataset:
    """ORDER BY key LIMIT k without a full sort shuffle: per-block local
    top-k (map_batches) shrinks the input to ≤ k rows/block, then one
    tiny sort+limit finishes.  At 100 TB this turns an all-to-all sort
    into a near-map-only plan (the reference gets the same effect from
    Limit forwarding only referenced rows, limit.hpp:12)."""
    keys = [key] + ([tiebreak] if tiebreak else [])
    order = [(c, "descending" if descending and c == key else "ascending") for c in keys]

    def local_topk(batch: pa.Table) -> pa.Table:
        if len(batch) <= k:
            return batch
        idx = pc.select_k_unstable(
            batch, k=k, sort_keys=[(key, "descending" if descending else "ascending")]
        )
        return batch.take(idx)

    reduced = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    desc = [c == key and descending for c in keys]
    return reduced.sort(keys, descending=desc).limit(k)


# --------------------------------------------------------------------------
# aggregation (§2.6)
# --------------------------------------------------------------------------

_AGGS = {
    "sum": Sum, "min": Min, "max": Max, "avg": Mean, "mean": Mean, "std": Std,
}


def agg(fn: str, on: str | None = None) -> tuple[str, str | None]:
    """Aggregate spec used by :func:`aggregate` — ``agg("sum", "x")``."""
    return (fn, on)


def aggregate(
    ds: Dataset,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str | None]],
    num_partitions: int | None = None,
) -> Dataset:
    """AggregateHash (aggregate_hash.hpp:139): hash group-by + aggregates.

    Ray's ``groupby().aggregate`` already does partial (per-block)
    aggregation before the key shuffle — the combiner pattern the
    reference implements with per-chunk key-partitioning jobs
    (aggregate_hash.cpp:260,308).

    ``aggs``: out_name → (fn, col) with fn in
    {sum,min,max,avg,std,count,count_star,count_distinct}.
    CountDistinct is exact, like the reference's robin-set per group
    (aggregate_hash.hpp:70-79): a first groupby on (keys, col)
    deduplicates, a second counts — two shuffles but each fully
    pre-aggregated."""
    keys = list(keys)
    plain, distincts = [], {}
    for name, (fn, on) in aggs.items():
        if fn == "count_distinct":
            distincts[name] = on
        elif fn == "count_star":
            plain.append(Count(alias_name=name))
        elif fn == "count":
            plain.append(Count(on=on, ignore_nulls=True, alias_name=name))
        else:
            plain.append(_AGGS[fn](on=on, alias_name=name))

    gb = ds.groupby(keys or None)
    result = gb.aggregate(*plain) if plain else None

    for name, dcol in distincts.items():
        # (keys, col) distinct pass, then count per keys
        dd = (
            ds.groupby(keys + [dcol]).aggregate(Count(alias_name="_one"))
            .groupby(keys or None).aggregate(Count(alias_name=name))
        )
        if result is None:
            result = dd
        else:
            # repartition heals the zero-column empty blocks Ray's
            # hash aggregator emits for empty partitions, which
            # otherwise break the downstream join's schema check
            np_ = num_partitions or 8
            result = result.repartition(np_).join(
                dd.repartition(np_), join_type="inner", on=tuple(keys),
                num_partitions=np_,
            )
    assert result is not None
    return result


# --------------------------------------------------------------------------
# joins (§2.5)
# --------------------------------------------------------------------------

def hash_join(
    left: Dataset, right: Dataset, on: Sequence[str],
    right_on: Sequence[str] | None = None,
    how: str = "inner", num_partitions: int = 32,
) -> Dataset:
    """JoinHash equality join (join_hash.hpp:20-46) via Ray's
    hash-shuffle join.  how ∈ {inner, left_outer, right_outer,
    full_outer}; semi/anti live in :func:`semi_join`/:func:`anti_join`
    (broadcast — the reference's Bloom-filter trick, join_hash.hpp:54-58,
    taken to its conclusion)."""
    return left.join(
        right, join_type=how, num_partitions=num_partitions,
        on=tuple(on), right_on=tuple(right_on) if right_on else None,
    )


def _key_hash(batch: pa.Table, on: Sequence[str]) -> pa.Array:
    """Composite key → string (null-safe) for hash-set membership."""
    parts = []
    for c in on:
        a = batch.column(c) if isinstance(batch, pa.Table) else batch[c]
        a = pc.cast(a, pa.string())
        parts.append(pc.coalesce(a, pa.scalar("\x00null")))
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, "\x1f")


class _BroadcastJoiner:
    """Actor-pool UDF: small side fetched from the object store ONCE per
    actor in ``__init__`` (SURVEY.md §2.4 build-once state pattern), then
    probed per batch — never re-shipped per block."""

    def __init__(self, small_ref, on, right_on, how):
        small: pa.Table = ray.get(small_ref)
        self.on, self.how = list(on), how
        self.right_on = list(right_on or on)
        if how in ("semi", "anti"):
            kh = _key_hash(small, self.right_on)
            if isinstance(kh, pa.ChunkedArray):
                kh = kh.combine_chunks()
            self.keyset = pc.unique(kh)
        else:
            self.small_pd = small.to_pandas()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.how in ("semi", "anti"):
            mask = pc.is_in(_key_hash(batch, self.on), value_set=self.keyset)
            if self.how == "anti":
                mask = pc.invert(mask)
            return batch.filter(mask)
        left_pd = batch.to_pandas()
        merged = left_pd.merge(
            self.small_pd, how=self.how, left_on=self.on, right_on=self.right_on,
        )
        return pa.Table.from_pandas(merged, preserve_index=False)


def broadcast_join(
    left: Dataset, small: pa.Table | Dataset, on: Sequence[str],
    right_on: Sequence[str] | None = None, how: str = "inner",
    concurrency: tuple[int, int] = (1, 8),
) -> Dataset:
    """Broadcast-small-side join: no shuffle of the big side at all.
    ``small`` must fit in one worker's heap (dimension tables, reduced
    aggregates, candidate sets)."""
    if isinstance(small, Dataset):
        refs = small.to_arrow_refs()
        small = pa.concat_tables(
            [ray.get(r) for r in refs], promote_options="default"
        )
    small_ref = ray.put(small)
    return left.map_batches(
        _BroadcastJoiner,
        fn_constructor_args=(small_ref, on, right_on, how),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency,
    )


def semi_join(left: Dataset, right: pa.Table | Dataset, on: Sequence[str],
              right_on: Sequence[str] | None = None) -> Dataset:
    """JoinHash Semi mode (join_hash.hpp:20): keep left rows with a match."""
    return broadcast_join(left, right, on, right_on, how="semi")


def anti_join(left: Dataset, right: pa.Table | Dataset, on: Sequence[str],
              right_on: Sequence[str] | None = None) -> Dataset:
    """JoinHash AntiNullAsFalse mode: keep left rows without a match."""
    return broadcast_join(left, right, on, right_on, how="anti")


def multi_predicate_join(
    left: Dataset, right: Dataset, on: Sequence[str],
    right_on: Sequence[str] | None, residual,
    how: str = "inner", num_partitions: int = 32,
) -> Dataset:
    """Equality join + secondary predicates — the reference evaluates
    extra predicates during the probe (multi_predicate_join_evaluator.cpp);
    ours composes hash_join with a residual table_scan, which Ray fuses
    into the join's output stage (same I/O, same result)."""
    joined = hash_join(left, right, on, right_on, how, num_partitions)
    return table_scan(joined, residual)


def theta_join(left: Dataset, small: pa.Table, predicate) -> Dataset:
    """Non-equi (theta) join against a broadcast small side — the
    JoinNestedLoop fallback (join_nested_loop.hpp:18): cross product
    per batch, then the predicate mask.  Only for genuinely small right
    sides; range predicates over two large sides belong to a sort-merge
    composition (ds.sort + windowed map_groups, SURVEY.md §2.5)."""
    return table_scan(product(left, small), predicate)


def product(left: Dataset, right: pa.Table) -> Dataset:
    """Product / cross join (product.hpp:19): right side broadcast,
    per-batch cartesian via repeat/tile takes (tests & tiny dims only,
    same caveat as the reference's nested-loop family)."""
    right_ref = ray.put(right)

    class _Cross:
        def __init__(self):
            self.right: pa.Table = ray.get(right_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            n_l, n_r = len(batch), len(self.right)
            li = np.repeat(np.arange(n_l), n_r)
            ri = np.tile(np.arange(n_r), n_l)
            out = batch.take(li)
            for name in self.right.column_names:
                out = out.append_column(name, self.right.column(name).take(ri))
            return out

    return left.map_batches(_Cross, batch_format="pyarrow",
                            zero_copy_batch=True, concurrency=(1, 4))


# --------------------------------------------------------------------------
# set operations & exact dedup (§2.8)
# --------------------------------------------------------------------------

def union_all(a: Dataset, b: Dataset) -> Dataset:
    """UnionAll (union_all.hpp:13)."""
    return a.union(b)


def distinct(ds: Dataset, cols: Sequence[str] | None = None) -> Dataset:
    """SELECT DISTINCT — the reference lowers it to an AggregateNode
    grouping by all columns with no aggregates (sql_translator.cpp:1148);
    ours is the same: groupby(cols) + Count (partial-aggregated, one
    shuffle), then drop the count."""
    if cols:
        ds = ds.select_columns(list(cols))
        names = list(cols)
    else:
        names = ds.schema().names
    return ds.groupby(names).aggregate(Count(alias_name="_n")).select_columns(names)


def union_distinct(a: Dataset, b: Dataset) -> Dataset:
    """SQL UNION (distinct)."""
    return distinct(a.union(b))


def difference(a: Dataset, b: pa.Table | Dataset, on: Sequence[str] | None = None) -> Dataset:
    """Difference / EXCEPT (difference.hpp:14-17): distinct left rows
    with no matching right row.  The reference matches on the string
    representation of whole rows; we hash the key columns null-safely."""
    cols = list(on) if on else a.schema().names
    return anti_join(distinct(a, cols), b, cols)


def intersect(a: Dataset, b: pa.Table | Dataset, on: Sequence[str] | None = None) -> Dataset:
    """INTERSECT — the reference has only the LQP node (intersect_node.hpp),
    no physical operator (SURVEY.md §2.8); we implement it anyway as
    distinct + semi."""
    cols = list(on) if on else a.schema().names
    return semi_join(distinct(a, cols), b, cols)
