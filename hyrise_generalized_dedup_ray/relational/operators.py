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

from hyrise_generalized_dedup_ray.stages.exchange import exchange_join
from hyrise_generalized_dedup_ray.relational.expressions import (
    Expr, between, col,
)


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

def sort(
    ds: Dataset, keys: Sequence[str],
    descending: Sequence[bool] | bool = False,
    nulls_first: bool = True,
    tiebreak: Sequence[str] | str | None = None,
) -> Dataset:
    """Sort (sort.hpp:17-30) with reference parity: NULLS FIRST by
    default for every key (types.hpp:219-221), any asc/desc mix.

    Ray's range-partition sort places nulls per Arrow defaults and is
    NOT stable; both gaps are closed here without extra shuffles:

    - null placement: each key gets a prepended 0/1 valid-flag column
      (computed per batch, dropped after the sort), so nulls order
      BEFORE (or after) all values regardless of the key direction;
    - determinism: the reference's stability guarantee (equal keys keep
      input order, sort.cpp:379) has no distributed analog without a
      global input index — callers pin a total order by passing
      ``tiebreak`` columns, appended ascending after the keys.  This is
      exactly how the reference's own tests make sorted output
      comparable (SURVEY.md §2.7)."""
    keys = list(keys)
    if isinstance(descending, bool):
        descending = [descending] * len(keys)
    else:
        descending = list(descending)
    # tiebreak columns are just additional ascending keys — they get
    # the same null-flag treatment (a nullable tiebreak would otherwise
    # order its nulls per Arrow defaults, breaking the total order)
    if tiebreak:
        tb = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak)
        keys += [t for t in tb if t not in keys]
        descending += [False] * (len(keys) - len(descending))
    flag_names = [f"_nf_{k}" for k in keys]
    sort_cols: list[str] = []
    sort_desc: list[bool] = []
    for k, fn_, d in zip(keys, flag_names, descending):
        sort_cols += [fn_, k]
        # flag = 1 for valid: ascending flag ⇒ nulls (0) first
        sort_desc += [not nulls_first, d]

    def add_flags(batch: pa.Table) -> pa.Table:
        for k, fn_ in zip(keys, flag_names):
            batch = batch.append_column(
                fn_, pc.cast(pc.is_valid(batch.column(k)), pa.int8()))
        return batch

    out = ds.map_batches(add_flags, batch_format="pyarrow",
                         zero_copy_batch=True).sort(sort_cols,
                                                    descending=sort_desc)
    return out.map_batches(lambda b: b.drop_columns(flag_names),
                           batch_format="pyarrow", zero_copy_batch=True)


def top_k(ds: Dataset, key: str, k: int, descending: bool = True,
          tiebreak: str | None = None) -> Dataset:
    """ORDER BY key LIMIT k without a full sort shuffle: per-block local
    top-k (map_batches) shrinks the input to ≤ k rows/block, then one
    tiny sort+limit finishes.  At 100 TB this turns an all-to-all sort
    into a near-map-only plan (the reference gets the same effect from
    Limit forwarding only referenced rows, limit.hpp:12)."""
    keys = [key] + ([tiebreak] if tiebreak else [])
    # the local selection must ALSO rank by the tiebreak: ties on `key`
    # straddling the local k-th boundary are otherwise dropped
    # arbitrarily, making the result nondeterministic vs an
    # ORDER BY key, tiebreak LIMIT k oracle
    local_keys = [(c, "descending" if descending and c == key else "ascending")
                  for c in keys]

    def local_topk(batch: pa.Table) -> pa.Table:
        if len(batch) <= k:
            return batch
        idx = pc.select_k_unstable(batch, k=k, sort_keys=local_keys)
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
    has_distinct = any(fn == "count_distinct" for fn, _ in aggs.values())
    if keys and not has_distinct:
        # Ray's sort-based groupby comparison-sorts string key blocks
        # with Python objects — None vs str raises.  String(-null) keys
        # route through the engine's own one-shuffle kernel, which
        # hashes key VALUES null-safely (golden parity:
        # groupby_string_1gb_1agg/count_str_null.tbl).
        sch = ds.schema()
        base = getattr(sch, "base_schema", sch)
        if isinstance(base, pa.Schema) and any(
                pa.types.is_string(base.field(k).type)
                or pa.types.is_large_string(base.field(k).type)
                for k in keys):
            return _aggregate_with_distinct(ds, keys, aggs,
                                            num_partitions or 16)
    if has_distinct and keys:
        return _aggregate_with_distinct(ds, keys, aggs,
                                        num_partitions or 16)

    plain, distincts = [], {}
    for name, (fn, on) in aggs.items():
        if fn == "count_distinct":
            distincts[name] = on
        elif fn == "count_star":
            # Ray 2.49's Count() with no `on` returns 0 (observed);
            # COUNT(*) = count ANY column with nulls included
            star_col = keys[0] if keys else ds.schema().names[0]
            plain.append(Count(on=star_col, ignore_nulls=False,
                               alias_name=name))
        elif fn == "count":
            plain.append(Count(on=on, ignore_nulls=True, alias_name=name))
        else:
            plain.append(_AGGS[fn](on=on, alias_name=name))

    gb = ds.groupby(keys or None)
    if not distincts:
        return gb.aggregate(*plain)
    # global (no GROUP BY) with count_distinct: each piece reduces to a
    # scalar — assemble the single output row on the driver
    row: dict[str, Any] = dict(ds.aggregate(*plain)) if plain else {}
    for name, dcol in distincts.items():
        row[name] = distinct(ds, [dcol]).count()
    return ray.data.from_arrow(pa.table(
        {name: pa.array([row[name]]) for name in aggs}))


def _aggregate_with_distinct(
    ds: Dataset, keys: Sequence[str],
    aggs: dict[str, tuple[str, str | None]], num_partitions: int,
) -> Dataset:
    """GROUP BY with ≥1 COUNT(DISTINCT …): ONE hash shuffle on the key,
    every aggregate computed vectorized inside the partition kernel.

    Rationale: COUNT(DISTINCT) cannot be partially aggregated into a
    scalar, so its distinct (key, value) pairs must cross the shuffle
    regardless — an earlier revision paid two extra groupbys plus a
    repartition+join PER distinct aggregate to merge them back
    (visible as the slowest relational query in BENCH_r01).  Shuffling
    the raw rows once and reducing per partition is within ~2× of the
    theoretical floor whenever the distinct column is high-cardinality
    (the common case — ids), and removes three all-to-all exchanges.
    Std uses the two-pass mean/residual formula (numerically safer than
    sum-of-squares; ddof=1 like the reference's Welford,
    abstract_aggregate_operator.hpp:17-110).

    Shuffle routing (round 4): the key exchange runs on the engine's
    own hash_exchange (stages/exchange.py) with ``agg_partition`` as
    the per-shard reduce kernel — NOT Ray's sort-based
    ``groupby().map_groups``, whose boundary sampling + barriers
    stretch ~135 CPU-s of work to 60-240 s wall (measured,
    stages/exchange.py:5-11).  ``_pkey`` is already the shard id, so
    the exchange routes without re-hashing (key_is_shard)."""
    from hyrise_generalized_dedup_ray.functions.grouping import (
        partition_ids, sort_groups)
    from hyrise_generalized_dedup_ray.stages.exchange import hash_exchange

    keys = list(keys)
    need_cols = list(dict.fromkeys(
        keys + [on for _, on in aggs.values() if on]))
    base = ds.schema()
    base = getattr(base, "base_schema", base)
    out_schema = pa.schema(
        [(k, base.field(k).type) for k in keys]
        + [(name, _agg_out_type(base.field(on).type if on else None, fn))
           for name, (fn, on) in aggs.items()])
    map_schema = pa.schema(
        [(c, base.field(c).type) for c in need_cols]
        + [("_pkey", pa.int64())])

    def add_pkey(batch: pa.Table) -> pa.Table:
        # hash the key VALUES null-safely (dictionary codes are
        # block-local and do NOT agree across blocks / workers)
        from hyrise_generalized_dedup_ray.functions.hashing import \
            hash_strings
        kh = _key_hash(batch, keys)
        if isinstance(kh, pa.ChunkedArray):
            kh = kh.combine_chunks()
        hv = hash_strings(kh.to_numpy(zero_copy_only=False))
        pk = partition_ids(hv, num_partitions)
        return batch.select(need_cols).append_column(
            "_pkey", pa.array(pk, type=pa.int64()))

    def agg_partition(part: pa.Table) -> pa.Table:
        n = len(part)
        if n == 0:
            return out_schema.empty_table()
        # group identity inside the partition via per-partition
        # dictionary codes (consistent within one table)
        codes = []
        for k in keys:
            col_ = part.column(k)
            if isinstance(col_, pa.ChunkedArray):
                col_ = col_.combine_chunks()
            enc = col_.dictionary_encode()
            ind = enc.indices.to_numpy(zero_copy_only=False)
            ind = np.where(np.isnan(ind) if ind.dtype.kind == "f" else ind < 0,
                           -1, ind).astype(np.int64)
            codes.append(ind)
        order, starts, ends = sort_groups(tuple(codes))
        sizes = ends - starts
        first = order[starts]
        out: dict[str, pa.Array] = {
            k: part.column(k).take(pa.array(first)) for k in keys}
        for name, (fn, on) in aggs.items():
            if fn == "count_star":
                out[name] = pa.array(sizes, type=pa.int64())
                continue
            col_ = part.column(on)
            if isinstance(col_, pa.ChunkedArray):
                col_ = col_.combine_chunks()
            valid = pc.is_valid(col_).to_numpy(zero_copy_only=False)
            valid_o = valid[order].astype(np.int64)
            cnt = np.add.reduceat(valid_o, starts)
            if fn == "count":
                out[name] = pa.array(cnt, type=pa.int64())
            elif fn == "count_distinct":
                draw = pc.dictionary_encode(col_).indices.to_numpy(
                    zero_copy_only=False)
                # null indices surface as NaN floats: pin them to -1
                # (they are excluded via `valid` below either way)
                dcodes = (np.where(np.isnan(draw), -1, draw)
                          if draw.dtype.kind == "f" else draw).astype(np.int64)
                # distinct per group: sort (group, value-code), count
                # boundaries; nulls (code kept distinct then excluded)
                o2, s2, e2 = sort_groups(tuple(codes) + (dcodes,))
                uniq_rows = np.zeros(n, dtype=np.int64)
                uniq_rows[s2] = 1
                # map each unique (group, value) row to its group slot:
                # prefix-count of group starts
                gslot = np.zeros(n, dtype=np.int64)
                gstarts2 = np.zeros(n, dtype=bool)
                # recompute group boundaries under o2's ordering: same
                # groups, same sizes (codes sorted identically first)
                gb_change = np.zeros(n, dtype=bool)
                gb_change[0] = True
                for c in codes:
                    cs = c[o2]
                    gb_change[1:] |= cs[1:] != cs[:-1]
                gidx = np.cumsum(gb_change) - 1
                dv = valid[o2].astype(np.int64) * uniq_rows
                nd = np.bincount(gidx, weights=dv,
                                 minlength=len(starts)).astype(np.int64)
                out[name] = pa.array(nd, type=pa.int64())
            else:
                # SQL/reference null conventions (golden .tbl parity,
                # resources/test_data/tbl/aggregateoperator): an
                # all-null group aggregates to NULL (never 0/±inf),
                # and STDDEV_SAMP needs ≥2 non-null values.
                # Dtype-preserving like the reference's per-type
                # AggregateTraits (aggregate_traits.hpp): integer /
                # temporal SUM/MIN/MAX stay exact int64 (float64 loses
                # exactness past 2^53 and breaks oracle value-hash
                # parity), via fill_null sentinels — Arrow's to_numpy
                # on a nullable int column would silently yield float64
                # NaNs.
                t = col_.type
                int_like = (pa.types.is_integer(t)
                            or pa.types.is_boolean(t))
                temporal = pa.types.is_temporal(t)
                empty = cnt == 0
                if fn in ("min", "max") and not (
                        int_like or temporal or pa.types.is_floating(t)):
                    # generic ordered path (strings, binary, …):
                    # rank rows by sorted dictionary position, reduceat
                    # the ranks, map winning rank back to its value
                    enc = col_.dictionary_encode()
                    d = enc.dictionary
                    sort_idx = pc.array_sort_indices(d).to_numpy(
                        zero_copy_only=False).astype(np.int64)
                    rank_of = np.empty(max(len(d), 1), dtype=np.int64)
                    rank_of[sort_idx] = np.arange(len(d), dtype=np.int64)
                    idx = enc.indices.to_numpy(zero_copy_only=False)
                    idx = (np.where(np.isnan(idx), -1, idx)
                           if idx.dtype.kind == "f"
                           else idx).astype(np.int64)
                    big = np.int64(len(d) + 1)
                    sent = big if fn == "min" else np.int64(-1)
                    rk = np.where(idx >= 0,
                                  rank_of[np.maximum(idx, 0)], sent)
                    red = (np.minimum if fn == "min"
                           else np.maximum).reduceat(rk[order], starts)
                    safe = np.where(empty, 0, red)
                    out[name] = d.take(
                        pa.array(sort_idx[safe], type=pa.int64())
                    ) if len(d) else pa.nulls(len(starts), type=t)
                    if len(d):
                        out[name] = pc.if_else(
                            pa.array(~empty), out[name], pa.scalar(None, t))
                    continue
                if fn in ("sum", "min", "max") and (int_like or temporal):
                    i64 = pc.cast(col_, pa.int64())
                    if fn == "sum":
                        arr = pc.fill_null(i64, 0).to_numpy()[order]
                        s = np.add.reduceat(arr, starts)
                        out[name] = pa.array(s, type=pa.int64(), mask=empty)
                    else:
                        info = np.iinfo(np.int64)
                        sent = info.max if fn == "min" else info.min
                        arr = pc.fill_null(i64, sent).to_numpy()[order]
                        red = (np.minimum if fn == "min"
                               else np.maximum).reduceat(arr, starts)
                        res = pa.array(red, type=pa.int64(), mask=empty)
                        # SUM(int) is BIGINT in SQL; MIN/MAX keep the
                        # input type (timestamps round-trip via int64)
                        out[name] = pc.cast(res, t) if not (
                            pa.types.is_boolean(t)) else pc.cast(
                                pc.cast(res, pa.uint8()), t)
                    continue
                vals_o = col_.to_numpy(zero_copy_only=False)[order]
                fv = np.where(valid_o, vals_o.astype(np.float64), 0.0)
                s = np.add.reduceat(fv, starts)
                if fn == "sum":
                    out[name] = pa.array(s, type=pa.float64(), mask=empty)
                elif fn in ("avg", "mean"):
                    out[name] = pa.array(s / np.maximum(cnt, 1),
                                         type=pa.float64(), mask=empty)
                elif fn == "min":
                    mv = np.where(valid_o, vals_o.astype(np.float64), np.inf)
                    out[name] = pa.array(np.minimum.reduceat(mv, starts),
                                         type=pa.float64(), mask=empty)
                elif fn == "max":
                    mv = np.where(valid_o, vals_o.astype(np.float64), -np.inf)
                    out[name] = pa.array(np.maximum.reduceat(mv, starts),
                                         type=pa.float64(), mask=empty)
                elif fn == "std":
                    mean = s / np.maximum(cnt, 1)
                    resid = np.where(
                        valid_o,
                        (vals_o.astype(np.float64)
                         - np.repeat(mean, sizes)) ** 2, 0.0)
                    ss = np.add.reduceat(resid, starts)
                    with np.errstate(invalid="ignore", divide="ignore"):
                        out[name] = pa.array(
                            np.sqrt(ss / np.maximum(cnt - 1, 1)),
                            type=pa.float64(), mask=cnt < 2)
                else:
                    raise ValueError(f"unknown aggregate {fn}")
        cols = {k: out[k] for k in keys}
        cols.update({name: out[name] for name in aggs})
        return pa.table(cols)

    return hash_exchange(ds, add_pkey, "_pkey", agg_partition,
                         num_shards=num_partitions, schema=map_schema,
                         key_is_shard=True)


def _agg_out_type(t: pa.DataType | None, fn: str) -> pa.DataType:
    """Output dtype of one aggregate, mirroring agg_partition's
    per-type branches (the reference's AggregateTraits,
    aggregate_traits.hpp)."""
    if fn in ("count", "count_star", "count_distinct"):
        return pa.int64()
    int_like = pa.types.is_integer(t) or pa.types.is_boolean(t)
    temporal = pa.types.is_temporal(t)
    if fn == "sum":
        return pa.int64() if (int_like or temporal) else pa.float64()
    if fn in ("min", "max"):
        if int_like or temporal:
            return t
        if pa.types.is_floating(t):
            return pa.float64()
        return t          # generic ordered path (strings, binary, …)
    return pa.float64()   # avg / std


# --------------------------------------------------------------------------
# joins (§2.5)
# --------------------------------------------------------------------------

def hash_join(
    left: Dataset, right: Dataset, on: Sequence[str],
    right_on: Sequence[str] | None = None,
    how: str = "inner", num_partitions: int | None = None,
) -> Dataset:
    """JoinHash equality join (join_hash.hpp:20-46) on the engine's
    hash exchange: both sides map-split once on the key hash, then one
    vectorized Acero hash join per shard — the reference's
    radix-cluster + local build/probe shape (join_hash.cpp two-phase).
    how ∈ {inner, left_outer, right_outer, full_outer}; semi/anti live
    in :func:`semi_join`/:func:`anti_join` (broadcast — the reference's
    Bloom-filter trick, join_hash.hpp:54-58, taken to its conclusion)
    with :func:`exchange_join` ``how='semi'/'anti'`` as the
    both-sides-large path.  ``num_partitions`` defaults to cluster
    CPUs."""
    return exchange_join(left, right, on, right_on=right_on, how=how,
                         num_partitions=num_partitions)


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


def _valid_keys_mask(batch: pa.Table, on: Sequence[str]):
    """AND of is_valid over the key columns (nulls never join)."""
    mask = None
    for c in on:
        v = pc.is_valid(batch.column(c))
        mask = v if mask is None else pc.and_(mask, v)
    return mask


class _BroadcastJoiner:
    """Actor-pool UDF: small side fetched from the object store ONCE per
    actor in ``__init__`` (SURVEY.md §2.4 build-once state pattern), then
    probed per batch — never re-shipped per block.

    All modes are Arrow-native (no pandas round-trip): the build step
    sorts the small side by key hash and records run boundaries per
    distinct key; the probe maps each batch key with ``pc.index_in``
    and expands matches with vectorized repeat/arange takes — the
    classic hash-join build/probe recast on Arrow kernels
    (join_hash.hpp:20-46).

    NULL semantics match the reference (and SQL equality): a NULL key
    never matches anything — semi drops null-keyed probe rows, anti
    keeps them (AntiNullAsFalse), inner drops them, left emits them
    null-padded."""

    def __init__(self, small_ref, on, right_on, how):
        small: pa.Table = ray.get(small_ref)
        self.on, self.how = list(on), how
        self.right_on = list(right_on or on)
        # nulls never match: drop null-keyed build rows up front
        small = small.filter(_valid_keys_mask(small, self.right_on))
        kh = _key_hash(small, self.right_on)
        if isinstance(kh, pa.ChunkedArray):
            kh = kh.combine_chunks()
        if how in ("semi", "anti"):
            self.keyset = pc.unique(kh)
            return
        # inner/left build: sort by key, run-length boundaries per key
        khn = kh.to_numpy(zero_copy_only=False)
        order = np.argsort(khn, kind="stable")
        self.small = small.take(pa.array(order)).combine_chunks()
        khs = khn[order]
        if len(khs):
            change = np.flatnonzero(khs[1:] != khs[:-1]) + 1
            self.starts = np.concatenate([[0], change])
            self.ends = np.concatenate([change, [len(khs)]])
            self.uniq = pa.array(khs[self.starts])
        else:
            self.starts = self.ends = np.empty(0, dtype=np.int64)
            self.uniq = pa.array([], type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        kh = _key_hash(batch, self.on)
        valid = _valid_keys_mask(batch, self.on)
        if self.how in ("semi", "anti"):
            mask = pc.and_(pc.is_in(kh, value_set=self.keyset), valid)
            if self.how == "anti":
                mask = pc.invert(mask)
            return batch.filter(mask)
        idx = pc.index_in(kh, value_set=self.uniq)
        idx = pc.if_else(valid, idx, pa.scalar(None, type=idx.type))
        if isinstance(idx, pa.ChunkedArray):
            idx = idx.combine_chunks()
        matched = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        idxn = idx.to_numpy(zero_copy_only=False)  # float (NaN) or int
        mi = idxn[matched].astype(np.int64)
        counts = self.ends[mi] - self.starts[mi]
        # fan out: left row j (matched) repeats counts[j] times; right
        # rows are the contiguous runs [starts[mi], ends[mi])
        left_rows = np.flatnonzero(matched)
        left_take = np.repeat(left_rows, counts)
        total = int(counts.sum())
        run_starts = np.repeat(self.starts[mi], counts)
        offs = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]) if len(counts) else
            np.empty(0, dtype=np.int64), counts)
        right_take: np.ndarray = run_starts + offs
        right_names = [c for c in self.small.column_names
                       if c not in batch.column_names]
        if self.how == "left":
            unmatched = np.flatnonzero(~matched)
            left_take = np.concatenate([left_take, unmatched])
            right_idx = pa.array(
                np.concatenate([right_take,
                                np.zeros(len(unmatched), dtype=np.int64)]),
                mask=np.concatenate([np.zeros(total, dtype=bool),
                                     np.ones(len(unmatched), dtype=bool)]))
        else:
            right_idx = pa.array(right_take)
        out = batch.take(pa.array(left_take))
        for name in right_names:
            out = out.append_column(name, self.small.column(name).take(right_idx))
        return out


_BROADCAST_HOW = {
    "inner": "inner", "left": "left", "left_outer": "left",
    "semi": "semi", "anti": "anti",
}


def broadcast_join(
    left: Dataset, small: pa.Table | Dataset, on: Sequence[str],
    right_on: Sequence[str] | None = None, how: str = "inner",
    concurrency: tuple[int, int] = (1, 8),
) -> Dataset:
    """Broadcast-small-side join: no shuffle of the big side at all.
    ``small`` must fit in one worker's heap (dimension tables, reduced
    aggregates, candidate sets).

    ``how`` ∈ {inner, left / left_outer, semi, anti} — Ray-style
    ``left_outer`` is accepted and normalized.  right/full outer are
    NOT expressible per-batch against a broadcast side (which build
    rows matched *nothing anywhere* is global state) — use
    :func:`hash_join` for those."""
    if how not in _BROADCAST_HOW:
        raise ValueError(
            f"broadcast_join how={how!r} unsupported; one of "
            f"{sorted(_BROADCAST_HOW)} (right/full outer need hash_join)")
    how = _BROADCAST_HOW[how]
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


# right sides above this byte size stop being broadcast (one copy per
# worker heap) and route through the exchange join instead
SEMI_BROADCAST_MAX_BYTES = 2 << 30


def _semi_anti(left: Dataset, right: pa.Table | Dataset, on, right_on,
               how: str) -> Dataset:
    if isinstance(right, Dataset):
        right = right.materialize()
        if (right.size_bytes() or 0) > SEMI_BROADCAST_MAX_BYTES:
            # both-sides-large path: hash exchange + per-shard Acero
            # semi/anti (same SQL NULL semantics: nulls never match,
            # anti keeps null-keyed left rows)
            keep = right_on or on
            return exchange_join(left, right.select_columns(list(keep)),
                                 on, right_on=right_on, how=how)
    return broadcast_join(left, right, on, right_on, how=how)


def semi_join(left: Dataset, right: pa.Table | Dataset, on: Sequence[str],
              right_on: Sequence[str] | None = None) -> Dataset:
    """JoinHash Semi mode (join_hash.hpp:20): keep left rows with a
    match.  Broadcast build side (the reference's Bloom-filter trick
    taken to its conclusion) below ``SEMI_BROADCAST_MAX_BYTES``;
    exchange join above."""
    return _semi_anti(left, right, on, right_on, "semi")


def anti_join(left: Dataset, right: pa.Table | Dataset, on: Sequence[str],
              right_on: Sequence[str] | None = None) -> Dataset:
    """JoinHash AntiNullAsFalse mode: keep left rows without a match.
    Same size-guarded broadcast/exchange strategy as
    :func:`semi_join`."""
    return _semi_anti(left, right, on, right_on, "anti")


def _row_identity(ds: Dataset, cols: Sequence[str],
                  name: str = "_rid") -> Dataset:
    """Append a NULL-SAFE full-row identity string column: two rows get
    the same identity iff they agree on ``cols`` treating NULL as a
    comparable value (unlike SQL equality).  Duplicate rows share an
    identity by design — identical rows have identical join outcomes,
    so identity-level match status is row-level match status."""
    cols = list(cols)

    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column(name, _key_hash(batch, cols))

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def _null_extend_unmatched(
    left: Dataset, inner: Dataset, extend_fields: list[tuple[str, pa.DataType]],
) -> Dataset:
    """LEFT-OUTER tail for composed joins: left rows with NO row in
    ``inner`` (matched on null-safe full-row identity) get the right
    side's columns appended as typed nulls.  Multiset-correct: every
    copy of an unmatched left row extends; matched copies are all
    represented in ``inner`` already (each copy joined)."""
    lnames = left.schema().names
    lk = _row_identity(left, lnames)
    mk = _row_identity(distinct(inner, lnames), lnames)
    unmatched = anti_join(lk, mk.select_columns(["_rid"]), ["_rid"]) \
        .drop_columns(["_rid"])

    def extend(batch: pa.Table) -> pa.Table:
        for n, t in extend_fields:
            batch = batch.append_column(n, pa.nulls(len(batch), t))
        return batch

    return unmatched.map_batches(extend, batch_format="pyarrow",
                                 zero_copy_batch=True)


def multi_predicate_join(
    left: Dataset, right: Dataset, on: Sequence[str],
    right_on: Sequence[str] | None, residual,
    how: str = "inner", num_partitions: int = 32,
) -> Dataset:
    """Equality join + secondary predicates — the reference evaluates
    extra predicates during the probe (multi_predicate_join_evaluator.cpp);
    ours composes hash_join with a residual table_scan, which Ray fuses
    into the join's output stage (same I/O, same result).

    ``how='left_outer'``: SQL compound-ON semantics — a left row whose
    matches ALL fail the residual is null-extended, not dropped (a
    plain filter over a left join would wrongly drop it), via an
    inner pass + null-safe row-identity anti tail."""
    inner = table_scan(
        hash_join(left, right, on, right_on, "inner", num_partitions),
        residual)
    if how == "inner":
        return inner
    if how not in ("left", "left_outer"):
        raise NotImplementedError(f"multi_predicate_join how={how}")
    rs = right.schema()
    keys = set(right_on if right_on is not None else on)
    ext = [(n, rs.types[i]) for i, n in enumerate(rs.names)
           if n not in keys]
    return union_all(inner, _null_extend_unmatched(left, inner, ext))


def band_join(
    left: Dataset, right: Dataset, left_on: str, right_on: str,
    lo: int, hi: int, num_partitions: int = 32,
) -> Dataset:
    """Non-equi range join over TWO LARGE sides:
    ``right.right_on - left.left_on ∈ [lo, hi]`` (keys int64; cast
    timestamps to epoch first).  The reference covers this case with
    JoinSortMerge (join_sort_merge.hpp:15-25, its only operator for
    band predicates when neither side fits memory).

    Ray-Data recast: *range bucketing* instead of a global sort —
    bucket width ``W = hi - lo`` means each left row's admissible right
    interval spans at most TWO buckets, so the left side is exploded
    ≤2× with a bucket id, the right side gets its single bucket id, and
    ONE equi hash-join on the bucket co-locates every admissible pair;
    a residual scan applies the exact band predicate.  Same data
    movement as a sort-merge partition pass, but no boundary sampling
    and no skew-sensitive global sort; per-bucket fan-out is bounded by
    the key density within one band width (pick the band accordingly).
    Column names of the two sides must be disjoint (project/rename
    first), like the reference requires distinct output columns."""
    width = max(int(hi) - int(lo), 1)

    def explode_left(batch: pa.Table) -> pa.Table:
        k = batch.column(left_on).to_numpy(zero_copy_only=False).astype(np.int64)
        b0 = np.floor_divide(k + lo, width)
        b1 = np.floor_divide(k + hi, width)
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(k)), reps)
        total = int(reps.sum())
        excl = np.concatenate([[0], np.cumsum(reps)[:-1]]) if len(reps) else \
            np.empty(0, dtype=np.int64)
        off = np.arange(total) - np.repeat(excl, reps)
        bucket = b0[idx] + off
        return batch.take(pa.array(idx)).append_column(
            "_band_bucket", pa.array(bucket, type=pa.int64()))

    def bucket_right(batch: pa.Table) -> pa.Table:
        k = batch.column(right_on).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "_band_bucket", pa.array(np.floor_divide(k, width), type=pa.int64()))

    le = left.map_batches(explode_left, batch_format="pyarrow",
                          zero_copy_batch=True)
    re_ = right.map_batches(bucket_right, batch_format="pyarrow",
                            zero_copy_batch=True)
    j = exchange_join(le, re_, on=["_band_bucket"],
                      num_partitions=num_partitions)
    band = table_scan(
        j, between(col(right_on) - col(left_on), int(lo), int(hi)))
    return band.drop_columns(["_band_bucket"])


def exists_join(
    left: Dataset, right: Dataset | pa.Table, on: Sequence[str],
    right_on: Sequence[str] | None = None, residual: Expr | None = None,
    negate: bool = False, num_partitions: int = 32,
) -> Dataset:
    """(NOT) EXISTS with a correlated subquery, rewritten to joins —
    the reference's SubqueryToJoinRule (subquery_to_join_rule.cpp,
    exists_expression.hpp:7-12): the equality correlation becomes a
    semi/anti join key; any residual correlated predicate (non-equi
    terms referencing both sides) is evaluated on an inner-join probe
    first, and the distinct matching key set drives the final
    semi/anti join, so left rows are never duplicated or dropped by
    fan-out."""
    if residual is None:
        fn = anti_join if negate else semi_join
        return fn(left, right, on, right_on)
    # the residual may reference LEFT columns beyond the correlation
    # key (… s.b = r.b AND s.c < r.c), so two left rows sharing a key
    # can have different EXISTS outcomes — the probe must be keyed by
    # the left ROW (null-safe row identity), not the join key alone
    lnames = list(left.schema().names)
    lk = _row_identity(left, lnames)
    j = hash_join(lk, right, on, right_on, "inner", num_partitions)
    matched = distinct(table_scan(j, residual), ["_rid"])
    fn = anti_join if negate else semi_join
    return fn(lk, matched.select_columns(["_rid"]),
              ["_rid"]).drop_columns(["_rid"])


def theta_join(left: Dataset, small: pa.Table, predicate,
               how: str = "inner") -> Dataset:
    """Non-equi (theta) join against a broadcast small side — the
    JoinNestedLoop fallback (join_nested_loop.hpp:18, which supports
    Inner and the outer modes via its ``JoinMode`` switch): cross
    product per batch, then the predicate mask.  Only for genuinely
    small right sides; range predicates over two large sides belong to
    a sort-merge composition (ds.sort + windowed map_groups,
    SURVEY.md §2.5).

    ``how='left_outer'``: SQL ``LEFT JOIN ... ON <theta>`` — a left row
    with NO qualifying right row survives null-extended (the inner pass
    plus the engine's null-safe row-identity anti tail, same shape as
    :func:`multi_predicate_join`).  Column names must be disjoint."""
    inner = table_scan(product(left, small), predicate)
    if how == "inner":
        return inner
    if how not in ("left", "left_outer"):
        raise NotImplementedError(f"theta_join how={how}")
    ext = [(f.name, f.type) for f in small.schema]
    return union_all(inner, _null_extend_unmatched(left, inner, ext))


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


def hash_sample(ds: Dataset, id_col: str, rate_ppm: int,
                seed: int = 0) -> Dataset:
    """Deterministic hash sampling (§2.7 sampling, recast for
    training-data pipelines): keep rows where
    ``splitmix64(id ^ mix(seed)) % 1e6 < rate_ppm``.

    Unlike ``Dataset.random_sample`` this is REPRODUCIBLE and
    RESUME-SAFE: membership depends only on (id, seed), so a re-run, a
    different partitioning, or a resumed job selects the same rows —
    the property a training-data subset needs.  ``id_col`` must be
    non-negative int64 (SQL twin computes the same splitmix64 via
    128-bit limb arithmetic)."""
    from hyrise_generalized_dedup_ray.functions.hashing import splitmix64

    salt = np.uint64(splitmix64(np.array([seed], dtype=np.uint64))[0])
    rate = np.uint64(int(rate_ppm))

    def keep(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column(id_col), pa.int64()) \
            .to_numpy(zero_copy_only=False).view(np.uint64)
        h = splitmix64(ids ^ salt)
        return batch.filter(pa.array(h % np.uint64(1_000_000) < rate))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


def stratified_sample(ds: Dataset, id_col: str, group_col: str,
                      rates_ppm: dict[str, int], default_ppm: int = 0,
                      seed: int = 0) -> Dataset:
    """Per-group deterministic sampling — the data-mixing primitive: a
    ppm rate per ``group_col`` value (e.g. per source/language), same
    splitmix64(id ^ seed) gate as :func:`hash_sample`, so membership is
    reproducible and resume-safe AND independent of the group column
    (re-labeling a doc's source never changes which ids are eligible —
    the gate draws once per id, each group just cuts it at its own
    rate)."""
    from hyrise_generalized_dedup_ray.functions.hashing import splitmix64

    salt = np.uint64(splitmix64(np.array([seed], dtype=np.uint64))[0])
    rates = dict(rates_ppm)

    def keep(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column(id_col), pa.int64()) \
            .to_numpy(zero_copy_only=False).view(np.uint64)
        draw = (splitmix64(ids ^ salt) % np.uint64(1_000_000)) \
            .astype(np.int64)
        # dictionary-encode the group column: Python touches only the
        # O(#distinct) dictionary, the per-row lookup is one numpy take
        # (null group → index -1 → the appended default slot)
        enc = pc.dictionary_encode(batch.column(group_col))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        dict_rates = np.fromiter(
            (rates.get(g, default_ppm)
             for g in enc.dictionary.to_pylist()),
            dtype=np.int64, count=len(enc.dictionary))
        dict_rates = np.append(dict_rates, np.int64(default_ppm))
        idx = pc.fill_null(enc.indices, -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(draw < dict_rates[idx]))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


def print_table(ds: Dataset, n: int = 20) -> str:
    """Print operator (print.hpp:22): human-readable preview of the
    first ``n`` rows with the schema header, as a string (the reference
    streams to an ostream; callers print the return value)."""
    schema = ds.schema()
    header = " | ".join(f"{name}:{dtype}" for name, dtype
                        in zip(schema.names, schema.types))
    rows = ds.limit(n).take_all()
    lines = [header, "-" * len(header)]
    for r in rows:
        lines.append(" | ".join(str(r[c]) for c in schema.names))
    return "\n".join(lines)


# --------------------------------------------------------------------------
# set operations & exact dedup (§2.8)
# --------------------------------------------------------------------------

def union_all(a: Dataset, b: Dataset) -> Dataset:
    """UnionAll (union_all.hpp:13)."""
    return a.union(b)


def distinct(ds: Dataset, cols: Sequence[str] | None = None,
             num_partitions: int = 16) -> Dataset:
    """SELECT DISTINCT — the reference lowers it to an AggregateNode
    grouping by all columns with no aggregates (sql_translator.cpp:1148);
    ours is the same group-by-all-keys, run on the engine's own hash
    exchange (``_aggregate_with_distinct`` with an empty aggregate
    dict: ONE value-hash shuffle, per-shard dictionary-code grouping,
    first row of each group kept) — NOT Ray's sort-based groupby,
    whose range sampling + barriers the exchange module exists to
    avoid (stages/exchange.py:5-11).  Exact for any key type: shard
    routing hashes values, but group identity inside the shard is the
    actual (null-safe) tuple."""
    if cols:
        ds = ds.select_columns(list(cols))
        names = list(cols)
    else:
        names = ds.schema().names
    return _aggregate_with_distinct(ds, names, {}, num_partitions)


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


def aggregate_quantiles(
    ds: Dataset,
    keys: Sequence[str],
    col: str,
    qs: Sequence[float],
    num_partitions: int = 16,
) -> Dataset:
    """Per-group EXACT quantiles (linear interpolation — matches SQL
    ``quantile_cont`` and ``np.quantile``), the ordered-set member of
    the aggregate family.

    The reference's AggregateSort materializes each group sorted and
    walks it (aggregate_sort.cpp); here every group lands whole in one
    shard via ONE hash exchange on the key, and the per-shard kernel
    computes all requested quantiles vectorized (pandas groupby
    quantile — C-sorted per group, exact).  Quantiles cannot be
    partially aggregated, so the value column must cross the shuffle
    regardless; nothing else does."""
    import pandas as pd

    from hyrise_generalized_dedup_ray.functions.hashing import (
        hash_strings,
        mix2,
        splitmix64,
    )
    from hyrise_generalized_dedup_ray.stages.exchange import hash_exchange

    keys = list(keys)
    qs = list(qs)
    qnames = [f"q{int(round(q * 100)):02d}" for q in qs]

    def _key_hash(tab: pa.Table) -> np.ndarray:
        h = np.zeros(tab.num_rows, dtype=np.uint64)
        for k in keys:
            c = tab.column(k)
            if pa.types.is_string(c.type) or pa.types.is_large_string(c.type):
                hk = hash_strings(c.to_numpy(zero_copy_only=False))
            else:
                hk = splitmix64(c.to_numpy(zero_copy_only=False)
                                .astype(np.int64).view(np.uint64))
            h = mix2(h, hk)
        return h

    def map_fn(tab: pa.Table) -> pa.Table:
        tab = tab.select(keys + [col])
        return tab.append_column(
            "__gk", pa.array(_key_hash(tab).view(np.int64),
                             type=pa.int64()))

    def kernel(shard: pa.Table) -> pa.Table:
        df = shard.select(keys + [col]).to_pandas()
        if not len(df):
            empty = {k: pa.array([], type=shard.schema.field(k).type)
                     for k in keys}
            empty.update({qn: pa.array([], type=pa.float64())
                          for qn in qnames})
            return pa.table(empty)
        g = df.groupby(keys, dropna=False, sort=False)[col]
        out = pd.DataFrame({qn: g.quantile(q)
                            for qn, q in zip(qnames, qs)}).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    schema = pa.schema(
        [(k, ds.schema().base_schema.field(k).type) for k in keys]
        + [(col, ds.schema().base_schema.field(col).type),
           ("__gk", pa.int64())])
    return hash_exchange(ds, map_fn, "__gk", kernel,
                         num_shards=num_partitions, schema=schema)


def approx_count_distinct(ds: Dataset, col: str, p: int = 12) -> Dataset:
    """Approximate COUNT(DISTINCT col) via HyperLogLog
    (functions/sketch.py): each block folds to a 2^p-byte register
    array inside its map task, registers merge by elementwise max in a
    binary tree of Ray tasks (bloom-build shape, stages/bloom.py), and
    one row (n_approx:int64) comes back — the column's values never
    cross the wire.  ~1.04/√2^p relative error, deterministic
    (engine-wide SipHash).  Returns a 1-row Dataset."""
    import ray as _ray

    from hyrise_generalized_dedup_ray.functions.sketch import (
        hll_add_values,
        hll_empty,
        hll_estimate,
        hll_merge,
    )

    @_ray.remote
    def _block_regs(tab: pa.Table) -> np.ndarray:
        regs = hll_empty(p)
        vals = tab.column(col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        arr = vals.to_numpy(zero_copy_only=False)
        arr = arr[~pa.compute.is_null(vals).to_numpy(zero_copy_only=False)] \
            if vals.null_count else arr
        hll_add_values(regs, arr, p)
        return regs

    @_ray.remote
    def _merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return hll_merge(a, b)

    refs = [_block_regs.remote(r)
            for r in ds.select_columns([col]).to_arrow_refs()]
    if not refs:
        refs = [_ray.put(hll_empty(p))]
    while len(refs) > 1:
        nxt = [_merge.remote(refs[i], refs[i + 1])
               for i in range(0, len(refs) - 1, 2)]
        if len(refs) % 2:
            nxt.append(refs[-1])
        refs = nxt
    n = int(round(hll_estimate(_ray.get(refs[0]))))
    return ray.data.from_arrow(pa.table(
        {"n_approx": pa.array([n], type=pa.int64())}))
