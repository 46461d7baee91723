"""stages/exchange.py — the engine's direct hash-exchange operator.

Parity property: for any (map_fn, key, kernel), the concatenated
reduce outputs must equal running the kernel over a single-machine
groupby of the mapped rows by `partition_ids(key, P)` — same rows,
same per-shard co-location guarantee the partition kernels rely on.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray

from hyrise_generalized_dedup_ray.functions.grouping import partition_ids
from hyrise_generalized_dedup_ray.stages.exchange import (
    count_rows,
    hash_exchange,
    hash_exchange_refs,
    split_by_key,
)

I64 = pa.int64()
SCHEMA = pa.schema([("k", I64), ("v", I64)])


def _make_identity():
    # nested so cloudpickle ships it by value (a test-module global
    # would be pickled by reference and fail to import in workers)
    def identity(t: pa.Table) -> pa.Table:
        return t
    return identity


def _make_sum_kernel():
    def sum_kernel(part: pa.Table) -> pa.Table:
        k = part.column("k").to_numpy(zero_copy_only=False)
        v = part.column("v").to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks, vs = k[order], v[order]
        if len(ks) == 0:
            return pa.table({"k": pa.array([], type=I64),
                             "s": pa.array([], type=I64)})
        idx = np.flatnonzero(ks[1:] != ks[:-1]) + 1
        starts = np.concatenate([[0], idx])
        sums = np.add.reduceat(vs, starts)
        return pa.table({"k": pa.array(ks[starts], type=I64),
                         "s": pa.array(sums, type=I64)})
    return sum_kernel


def _make_ds(n: int, n_keys: int, seed: int, blocks: int = 7):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, n_keys, n).astype(np.int64)
    v = rng.integers(0, 1000, n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(k, type=I64), "v": pa.array(v, type=I64)})
    ).repartition(blocks)
    return ds, k, v


def test_exchange_groupby_sum_matches_numpy(ray_session):
    ds, k, v = _make_ds(20_000, 500, seed=1)
    out = hash_exchange(ds, _make_identity(), "k", _make_sum_kernel(), 16, SCHEMA)
    got = out.to_pandas().sort_values("k").reset_index(drop=True)
    import pandas as pd

    want = (pd.DataFrame({"k": k, "v": v}).groupby("k", as_index=False)
            ["v"].sum().rename(columns={"v": "s"}))
    assert got["k"].tolist() == want["k"].tolist()
    assert got["s"].tolist() == want["s"].tolist()


def test_exchange_colocates_equal_keys(ray_session):
    """Every shard sees either ALL rows of a key or none."""
    ds, k, _ = _make_ds(5_000, 37, seed=2)

    def keyset_kernel(part: pa.Table) -> pa.Table:
        ks = np.unique(part.column("k").to_numpy(zero_copy_only=False))
        return pa.table({"k": pa.array(ks, type=I64),
                         "v": pa.array(np.zeros(len(ks), np.int64))})

    out = hash_exchange(ds, _make_identity(), "k", keyset_kernel, 8, SCHEMA)
    seen = out.to_pandas()["k"]
    # each key appears in exactly one shard's unique-key list
    assert seen.is_unique
    assert set(seen) == set(np.unique(k))


def test_hierarchical_exchange_matches_flat(ray_session):
    """Two-level routing must produce EXACTLY the flat exchange's
    per-shard kernel outputs (same final shard assignment), for shard
    counts that stress per_group = 1 and > 1."""
    ds, k, v = _make_ds(20_000, 500, seed=4)
    for S, G in [(16, 4), (8, 8), (12, 3)]:
        flat = hash_exchange(ds, _make_identity(), "k",
                             _make_sum_kernel(), S, SCHEMA)
        hier = hash_exchange(ds, _make_identity(), "k",
                             _make_sum_kernel(), S, SCHEMA, num_groups=G)
        f = flat.to_pandas().sort_values("k").reset_index(drop=True)
        h = hier.to_pandas().sort_values("k").reset_index(drop=True)
        assert f.equals(h), (S, G)


def test_hierarchical_exchange_colocates_keys(ray_session):
    ds, k, _ = _make_ds(5_000, 37, seed=5)

    def keyset_kernel(part: pa.Table) -> pa.Table:
        ks = np.unique(part.column("k").to_numpy(zero_copy_only=False))
        return pa.table({"k": pa.array(ks, type=I64),
                         "v": pa.array(np.zeros(len(ks), np.int64))})

    out = hash_exchange(ds, _make_identity(), "k", keyset_kernel, 12,
                        SCHEMA, num_groups=4)
    seen = out.to_pandas()["k"]
    assert seen.is_unique and set(seen) == set(np.unique(k))


def test_exchange_empty_input(ray_session):
    ds = ray.data.from_arrow(SCHEMA.empty_table())
    out = hash_exchange(ds, _make_identity(), "k", _make_sum_kernel(), 4, SCHEMA)
    assert out.count() == 0


def test_exchange_seed_shards_and_key_is_shard(ray_session):
    """Seeds land in their exact shard; key_is_shard routes verbatim."""
    P = 5
    ds, k, v = _make_ds(3_000, 40, seed=3)

    def map_with_shard(t: pa.Table) -> pa.Table:
        kk = t.column("k").to_numpy(zero_copy_only=False)
        pk = partition_ids(kk, P)
        return pa.table({"k": pa.array(pk, type=I64), "v": t.column("v")})

    seed_tables = [pa.table({"k": pa.array([p], type=I64),
                             "v": pa.array([10_000], type=I64)})
                   for p in range(P)]

    def kernel(part: pa.Table) -> pa.Table:
        vv = part.column("v").to_numpy(zero_copy_only=False)
        kk = part.column("k").to_numpy(zero_copy_only=False)
        # all rows routed here carry the same shard id
        assert len(np.unique(kk)) <= 1
        return pa.table({"k": pa.array(kk[:1], type=I64),
                         "s": pa.array([int(vv.sum())], type=I64)})

    refs = hash_exchange_refs(
        ds.to_arrow_refs(), map_with_shard, "k", kernel, P, SCHEMA,
        seed_shards=seed_tables, key_is_shard=True)
    parts = ray.get(refs)
    total = sum(t.column("s")[0].as_py() for t in parts if t.num_rows)
    assert total == int(v.sum()) + 10_000 * P


def test_count_rows_and_split_by_key(ray_session):
    t = pa.table({"k": pa.array([1, 2, 3, 4], type=I64),
                  "v": pa.array([5, 6, 7, 8], type=I64)})
    shards = split_by_key(t, np.array([0, 1, 0, 1]), 2, key_is_shard=True)
    assert shards[0].column("k").to_pylist() == [1, 3]
    assert shards[1].column("k").to_pylist() == [2, 4]
    refs = [ray.put(s) for s in shards]
    assert count_rows(refs) == 4


def test_exchange_single_shard(ray_session):
    ds, k, v = _make_ds(1_000, 10, seed=4)
    out = hash_exchange(ds, _make_identity(), "k", _make_sum_kernel(), 1, SCHEMA)
    got = out.to_pandas()
    assert got["s"].sum() == v.sum()
    assert len(got) == len(np.unique(k))


def test_auto_hierarchical_switch(ray_session, monkeypatch):
    """Above the shuffle-object bound, hash_exchange_refs switches to
    the two-level path by itself — and the switched output is
    identical to the flat exchange's."""
    from hyrise_generalized_dedup_ray.stages import exchange as ex

    ds, k, v = _make_ds(20_000, 500, seed=6)
    flat = hash_exchange(ds, _make_identity(), "k",
                         _make_sum_kernel(), 16, SCHEMA) \
        .to_pandas().sort_values("k").reset_index(drop=True)

    calls = []
    orig = ex.hash_exchange_hierarchical_refs

    def spy(*args, **kwargs):
        calls.append(kwargs.get("num_groups"))
        return orig(*args, **kwargs)

    monkeypatch.setattr(ex, "hash_exchange_hierarchical_refs", spy)
    monkeypatch.setattr(ex, "_EXCHANGE_OBJECT_BOUND", 32)
    auto = hash_exchange(ds, _make_identity(), "k",
                         _make_sum_kernel(), 16, SCHEMA) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert calls, "hierarchical path did not trigger"
    assert 1 < calls[0] < 16 and 16 % calls[0] == 0
    assert flat.equals(auto)


def test_auto_hierarchical_join_switch(ray_session, monkeypatch):
    """exchange_join routes through exchange_join_hierarchical above
    the object bound with identical results."""
    from hyrise_generalized_dedup_ray.stages import exchange as ex

    lt = pa.table({"k": pa.array([1, 2, 2, 5, 7] * 40, type=I64),
                   "i": pa.array(range(200), type=I64)})
    rt = pa.table({"k2": pa.array([2, 5, 9], type=I64),
                   "tag": ["x", "y", "z"]})
    l = ray.data.from_arrow(lt).repartition(4)
    r = ray.data.from_arrow(rt).repartition(2)
    base = ex.exchange_join(l, r, on=["k"], right_on=["k2"],
                            num_partitions=8).to_pandas()

    calls = []
    orig = ex.exchange_join_hierarchical

    def spy(*args, **kwargs):
        calls.append(kwargs.get("num_groups"))
        return orig(*args, **kwargs)

    monkeypatch.setattr(ex, "exchange_join_hierarchical", spy)
    monkeypatch.setattr(ex, "_EXCHANGE_OBJECT_BOUND", 24)
    auto = ex.exchange_join(l, r, on=["k"], right_on=["k2"],
                            num_partitions=8).to_pandas()
    assert calls and 1 < calls[0] < 8 and 8 % calls[0] == 0
    assert sorted(map(tuple, base[["i", "tag"]].values.tolist())) == \
        sorted(map(tuple, auto[["i", "tag"]].values.tolist()))
