"""Physical-layout sweep over the conformance tranche.

The reference re-runs its sqlite-testrunner statements across every
segment ENCODING (src/test/lib/sql/sqlite_testrunner/ runs the same
343 statements per encoding config); the engine's physical analog is
the block layout a Dataset arrives in — operators must produce
identical results whether a table is one Arrow block or many ragged
ones (block-local dictionary codes, per-batch combiners, exchange
map-task bundling all change with it).

This module re-executes a diverse slice of the conformance CASES under
three block layouts (1, 3 and 7 blocks per input table, ragged splits)
by swapping the tranche's ``mk`` Dataset builder.  Layout-dependent
bugs (anything keyed on block-local state) fail here while the
single-block tranche stays green.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray

import tests.test_sqlite_conformance as C

# every 7th case: ~50 statements spanning scans, projections,
# aggregates, DISTINCT, ORDER BY, joins, EXISTS, subqueries, views
SLICE = C.CASES[::7]
LAYOUTS = [1, 3, 7]


def _mk_split(nb: int):
    def mk(tabs, name):
        t = tabs[name]
        n = t.num_rows
        if nb == 1 or n < 2 * nb:
            return ray.data.from_arrow(t)
        # ragged boundaries (not equal splits) so block sizes differ
        cuts = np.unique(np.concatenate(
            [[0], ((np.arange(1, nb) * n) // nb + np.arange(1, nb) % 3),
             [n]]))
        cuts = cuts[cuts <= n]
        parts = [t.slice(int(a), int(b - a))
                 for a, b in zip(cuts[:-1], cuts[1:]) if b > a]
        return ray.data.from_arrow(parts)
    return mk


@pytest.mark.parametrize("nb", LAYOUTS)
@pytest.mark.parametrize(
    "name,builder,sql,ordered",
    [(x[0], x[1], x[2], x[3] if len(x) > 3 else False) for x in SLICE],
    ids=[x[0] for x in SLICE])
def test_layout_conformance(ray_session, monkeypatch, tabs, oracle,
                            nb, name, builder, sql, ordered):
    monkeypatch.setattr(C, "mk", _mk_split(nb))
    out = builder(tabs)
    ours = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    C.assert_same(ours, oracle, sql, ordered=ordered)


# reuse the tranche's module-scoped fixtures
tabs = C.tabs
oracle = C.oracle
