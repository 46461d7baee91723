"""Relational transform library — the Ray-Data recast of the reference's
operator set (SURVEY.md §2).

Everything here is a thin builder over ``ray.data.Dataset``: expressions
compile to ``pyarrow.compute`` kernels evaluated inside ``map_batches``
on zero-copy Arrow batches; wide operators delegate to Ray's
hash-shuffle ``groupby`` / range-partition ``sort`` / hash ``join``.
"""

from hyrise_generalized_dedup_ray.relational.expressions import (  # noqa: F401
    add, and_, between, case, cast, coalesce, col, concat, div, eq, extract,
    ge, gt, in_, is_not_null, is_null, le, like, lit, lt, mod, mul, ne, neg,
    not_, or_, round_, sub, substr, trunc,
)
from hyrise_generalized_dedup_ray.relational.operators import (  # noqa: F401
    agg, aggregate, aggregate_quantiles, alias, anti_join, approx_count_distinct, band_join, broadcast_join, difference,
    distinct, exists_join, hash_join, hash_sample, intersect, limit,
    multi_predicate_join, print_table, product, projection, semi_join,
    sort, table_scan, theta_join, top_k, union_all, union_distinct,
)
from hyrise_generalized_dedup_ray.relational.catalog import (  # noqa: F401
    export_table, export_tbl, import_file, load_table, load_tbl,
)
