"""Partitioned window functions: ROW_NUMBER, RANK, DENSE_RANK,
LAG, LEAD, running SUM.

The reference has no window operator (its SQL surface predates them);
they are nonetheless table stakes for the analytics its users run and
for training-data pipelines (per-source ranking, quota cuts, change
detection).  Ray Data has no window API either, so this is a custom
operator per SURVEY §7's escape-hatch rule: ONE hash exchange on the
partition key co-locates each partition, then a single vectorized
kernel (lexsort + run boundaries) computes every requested function —
no per-row Python, no global sort (the ordering is per partition, so a
range-partitioned global sort would be wasted movement).

Determinism: ties in ``order_by`` make LAG/LEAD/cumulative outputs
order-dependent; pass a unique tiebreak column as the last order key
(the SQL twin must ORDER BY the same list).  RANK/DENSE_RANK treat
``order_by`` ties exactly like SQL (the optional tiebreak column is
NOT part of the rank key — pass it separately).

Scale contract: one shuffle on the partition key; a single hot
partition lands whole in one reduce (window semantics require it —
pre-split is impossible without breaking frame continuity)."""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from hyrise_generalized_dedup_ray.stages.exchange import (_pa_schema,
                                                          hash_exchange)

_I64 = pa.int64()
_FNS = ("row_number", "rank", "dense_rank", "lag", "lead", "cumsum")


def window_over(
    ds: Dataset,
    partition_col: str,
    order_by: Sequence[str],
    specs: dict[str, tuple[str, str | None]],
    rank_keys: int | None = None,
    num_partitions: int | None = None,
) -> Dataset:
    """Append window columns per ``specs`` (out_name → (fn, value_col);
    value_col is None for the rank family).  ``order_by`` orders rows
    within each partition (ascending; include a unique tiebreak last);
    ``rank_keys`` limits how many leading order columns form the
    RANK/DENSE_RANK equality key (default: all of ``order_by``).
    Input requirement: ``partition_col`` int64-castable non-null,
    ``order_by`` numeric/temporal non-null."""
    order_by = list(order_by)
    for name, (fn, _) in specs.items():
        if fn not in _FNS:
            raise ValueError(f"{name}: unknown window fn {fn!r}")
    rk = len(order_by) if rank_keys is None else int(rank_keys)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    P = num_partitions or max(2, cpus)
    schema = _pa_schema(ds)

    def out_type(fn: str, on: str | None) -> pa.DataType:
        if fn in ("lag", "lead"):
            return schema.field(on).type
        if fn == "cumsum":
            return (pa.float64()
                    if pa.types.is_floating(schema.field(on).type)
                    else _I64)
        return _I64  # rank family

    out_fields = list(schema) + [pa.field(name, out_type(fn, on))
                                 for name, (fn, on) in specs.items()]
    out_schema = pa.schema(out_fields)

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        part = pc.cast(t.column(partition_col), _I64) \
            .to_numpy(zero_copy_only=False)
        def okey(c: str) -> np.ndarray:
            a = t.column(c)
            if (pa.types.is_temporal(a.type)
                    or pa.types.is_integer(a.type)):
                return pc.cast(a, _I64).to_numpy(zero_copy_only=False)
            return pc.cast(a, pa.float64()).to_numpy(zero_copy_only=False)

        okeys = [okey(c) for c in order_by]
        order = np.lexsort(tuple(reversed(okeys)) + (part,))
        t = t.take(pa.array(order))
        part = part[order]
        okeys = [k[order] for k in okeys]
        n = len(part)
        new_part = np.empty(n, dtype=bool)
        new_part[0] = True
        new_part[1:] = part[1:] != part[:-1]
        starts = np.flatnonzero(new_part)
        group_of = np.cumsum(new_part) - 1
        offset = starts[group_of]
        rownum = np.arange(n) - offset + 1
        # order-key run boundaries (for rank/dense_rank)
        new_key = new_part.copy()
        for k in okeys[:rk]:
            new_key[1:] |= k[1:] != k[:-1]
        key_start = np.maximum.accumulate(
            np.where(new_key, np.arange(n), 0))
        rank = key_start - offset + 1
        # dense_rank: 1 + key-runs since the partition's first run
        runs_cum = np.cumsum(new_key)
        dense = runs_cum - runs_cum[starts[group_of]] + 1

        arrs = {c: t.column(c) for c in t.column_names}
        for name, (fn, on) in specs.items():
            if fn == "row_number":
                arrs[name] = pa.array(rownum, type=_I64)
            elif fn == "rank":
                arrs[name] = pa.array(rank, type=_I64)
            elif fn == "dense_rank":
                arrs[name] = pa.array(dense, type=_I64)
            elif fn in ("lag", "lead"):
                col_ = t.column(on)
                if isinstance(col_, pa.ChunkedArray):
                    col_ = col_.combine_chunks()
                if fn == "lag":
                    idx = np.arange(n) - 1
                    valid = ~new_part
                else:
                    idx = np.arange(n) + 1
                    # a lead exists iff the NEXT row stays in-partition
                    valid = np.concatenate([~new_part[1:], [False]])
                idx = np.clip(idx, 0, n - 1)
                shifted = col_.take(pa.array(idx))
                arrs[name] = pc.if_else(pa.array(valid), shifted,
                                        pa.nulls(n, type=col_.type))
            elif fn == "cumsum":
                col_ = t.column(on)
                out_t = out_schema.field(name).type
                if (pa.types.is_integer(col_.type)
                        and col_.null_count == 0):
                    # accumulate natively in int64: float64 loses
                    # exactness past 2^53 on large running sums
                    v = pc.cast(col_, pa.int64()) \
                        .to_numpy(zero_copy_only=False)
                    cs = np.cumsum(v)
                    base = np.concatenate(
                        [np.zeros(1, np.int64), cs])[starts][group_of]
                else:
                    v = pc.cast(col_, pa.float64()) \
                        .to_numpy(zero_copy_only=False)
                    cs = np.cumsum(v)
                    base = np.concatenate([[0.0], cs])[starts][group_of]
                arrs[name] = pc.cast(pa.array(cs - base), out_t)
        cols = []
        for f in out_schema:
            a = arrs[f.name]
            if isinstance(a, pa.ChunkedArray):
                a = a.combine_chunks()
            cols.append(a)
        return pa.Table.from_arrays(cols, schema=out_schema)

    return hash_exchange(ds, lambda b: b, partition_col, kernel, P, schema)
