"""Expression surface: a small AST compiled to ``pyarrow.compute``.

Mirrors the reference's expression classes (SURVEY.md §2.3;
src/lib/expression/*.hpp evaluated by
src/lib/expression/evaluation/expression_evaluator.hpp:45).  Where
Hyrise walks an expression tree per chunk with hand-written SIMD-ish
loops, we compile the same tree once into a closure over vectorized
Arrow kernels and run it per batch inside ``map_batches`` — the batch
is the chunk.

Every node is an ``Expr``: calling ``expr(batch)`` on a
``pyarrow.Table`` (or a dict of arrays) yields a ``pyarrow.Array`` /
``ChunkedArray``.  NULL propagation and 3-valued logic follow SQL via
the Kleene kernels, matching the reference's semantics
(logical_expression.hpp:9).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import pyarrow as pa
import pyarrow.compute as pc

ArrayLike = Any  # pa.Array | pa.ChunkedArray


class Expr:
    """Base node; subclasses implement ``__call__(batch) -> array``."""

    _fn: Callable

    def __call__(self, batch: pa.Table) -> ArrayLike:
        raise NotImplementedError

    # operator sugar so pipelines read like SQL
    def __add__(self, o): return add(self, o)
    def __sub__(self, o): return sub(self, o)
    def __mul__(self, o): return mul(self, o)
    def __truediv__(self, o): return div(self, o)
    def __mod__(self, o): return mod(self, o)
    def __neg__(self): return neg(self)
    def __eq__(self, o): return eq(self, o)          # type: ignore[override]
    def __ne__(self, o): return ne(self, o)          # type: ignore[override]
    def __lt__(self, o): return lt(self, o)
    def __le__(self, o): return le(self, o)
    def __gt__(self, o): return gt(self, o)
    def __ge__(self, o): return ge(self, o)
    def __and__(self, o): return and_(self, o)
    def __or__(self, o): return or_(self, o)
    def __invert__(self): return not_(self)
    __hash__ = object.__hash__


class Col(Expr):
    """Column reference (the reference's LQPColumnExpression)."""

    def __init__(self, name: str):
        self.name = name

    def __call__(self, batch: pa.Table) -> ArrayLike:
        return batch.column(self.name) if isinstance(batch, pa.Table) else batch[self.name]


class Lit(Expr):
    """Literal value (value_expression.hpp)."""

    def __init__(self, value: Any):
        self.value = value

    def __call__(self, batch: pa.Table) -> ArrayLike:
        return pa.scalar(self.value)


class _Kernel(Expr):
    """n-ary node applying one pc kernel to evaluated children."""

    def __init__(self, fn: Callable, *children: Expr):
        self.fn = fn
        self.children = children

    def __call__(self, batch: pa.Table) -> ArrayLike:
        return self.fn(*[c(batch) for c in self.children])


def _wrap(v: Any) -> Expr:
    return v if isinstance(v, Expr) else Lit(v)


def col(name: str) -> Expr:
    return Col(name)


def lit(value: Any) -> Expr:
    return Lit(value)


# --- arithmetic (arithmetic_expression.hpp:9) ---------------------------
def add(a, b): return _Kernel(pc.add_checked, _wrap(a), _wrap(b))
def sub(a, b): return _Kernel(pc.subtract_checked, _wrap(a), _wrap(b))
def mul(a, b): return _Kernel(pc.multiply_checked, _wrap(a), _wrap(b))
def _null_zero_divisor(y):
    """SQL(ite)/reference semantics: x / 0 and x % 0 are NULL, not an
    error (sqlite_testrunner_queries.sql:118-119 diff these against
    SQLite).  A zero divisor is replaced with NULL so Arrow's kernel
    propagates null instead of raising ArrowInvalid (ints) or
    producing ±inf (floats)."""
    ty = y.type if hasattr(y, "type") else pa.int64()
    if not (pa.types.is_integer(ty) or pa.types.is_floating(ty)):
        return y
    return pc.if_else(pc.equal(y, pa.scalar(0, ty)
                               if pa.types.is_integer(ty)
                               else pa.scalar(0.0, ty)),
                      pa.scalar(None, ty), y)


def div(a, b):
    return _Kernel(lambda x, y: pc.divide(x, _null_zero_divisor(y)),
                   _wrap(a), _wrap(b))
def mod(a, b):
    # SQL % : pc has no modulo kernel → a - trunc(a/b)*b.  pc.divide
    # truncates for ints but is exact for floats, so the quotient must
    # be truncated explicitly before the multiply-back (otherwise the
    # float path degenerates to a - (a/b)*b ≈ 0 for every operand).
    a, b = _wrap(a), _wrap(b)
    def _mod(x, y):
        y = _null_zero_divisor(y)
        q = pc.divide(x, y)
        qt = q.type if hasattr(q, "type") else pa.float64()
        if pa.types.is_floating(qt):
            q = pc.trunc(q)
        else:
            q = pc.cast(q, x.type if hasattr(x, "type") else qt)
        return pc.subtract(x, pc.multiply(q, y))
    return _Kernel(_mod, a, b)
def neg(a): return _Kernel(pc.negate, _wrap(a))


# --- predicates (binary_predicate_expression.hpp:9, types.hpp:164) ------
def eq(a, b): return _Kernel(pc.equal, _wrap(a), _wrap(b))
def ne(a, b): return _Kernel(pc.not_equal, _wrap(a), _wrap(b))
def lt(a, b): return _Kernel(pc.less, _wrap(a), _wrap(b))
def le(a, b): return _Kernel(pc.less_equal, _wrap(a), _wrap(b))
def gt(a, b): return _Kernel(pc.greater, _wrap(a), _wrap(b))
def ge(a, b): return _Kernel(pc.greater_equal, _wrap(a), _wrap(b))


def between(x, lo, hi, bounds: str = "[]") -> Expr:
    """BETWEEN with the reference's four inclusive/exclusive variants
    (between_expression.hpp:9, types.hpp:171-174): bounds one of
    '[]', '[)', '(]', '()'."""
    x = _wrap(x)
    lo_op = ge if bounds[0] == "[" else gt
    hi_op = le if bounds[1] == "]" else lt
    return and_(lo_op(x, lo), hi_op(x, hi))


def in_(x, values: Sequence[Any]) -> Expr:
    """IN (…) value list (in_expression.hpp:10).

    SQL three-valued logic: NULL IN (…) is NULL, not FALSE —
    ``pc.is_in`` alone would return FALSE and ``NOT (x IN …)`` would
    then wrongly keep null rows (sqlite_testrunner_queries.sql's
    ``NOT (b IN (12, 13, 14))`` family)."""
    x = _wrap(x)
    vset = pa.array(list(values))

    def k(a):
        return pc.if_else(pc.is_valid(a), pc.is_in(a, value_set=vset),
                          pa.scalar(None, pa.bool_()))

    return _Kernel(k, x)


def is_null(x) -> Expr: return _Kernel(pc.is_null, _wrap(x))
def is_not_null(x) -> Expr: return _Kernel(pc.is_valid, _wrap(x))


def like(x, pattern: str, negate: bool = False) -> Expr:
    """SQL LIKE with %/_ wildcards (like_matcher.hpp:22-60);
    pc.match_like implements the same semantics natively."""
    x = _wrap(x)
    k = _Kernel(lambda a: pc.match_like(a, pattern), x)
    return not_(k) if negate else k


# --- logic: 3-valued Kleene (logical_expression.hpp:9) ------------------
def and_(a, b): return _Kernel(pc.and_kleene, _wrap(a), _wrap(b))
def or_(a, b): return _Kernel(pc.or_kleene, _wrap(a), _wrap(b))
def not_(a): return _Kernel(pc.invert, _wrap(a))


def case(*when_thens: tuple[Any, Any], else_: Any = None) -> Expr:
    """CASE WHEN c1 THEN v1 [WHEN c2 THEN v2 …] ELSE e END
    (case_expression.hpp:17) as a right-folded pc.if_else chain."""
    conds = [(_wrap(c), _wrap(v)) for c, v in when_thens]
    els = _wrap(else_)

    class _Case(Expr):
        def __call__(self, batch):
            out = els(batch)
            for c, v in reversed(conds):
                out = pc.if_else(c(batch), v(batch), out)
            return out

    return _Case()


def cast(x, target: pa.DataType) -> Expr:
    """CAST (cast_expression.hpp:14); lossy numeric→int casts follow
    Arrow (truncate disallowed unless safe=False — SQL truncation via
    safe=False to mirror lossless_cast.cpp's lossy path)."""
    x = _wrap(x)
    return _Kernel(lambda a: pc.cast(a, target, safe=False), x)


def round_(x, ndigits: int = 0) -> Expr:
    """ROUND half-away-from-zero, matching DuckDB's ROUND semantics."""
    return _Kernel(
        lambda a: pc.round(a, ndigits=ndigits, round_mode="half_towards_infinity"),
        _wrap(x),
    )


def trunc(x) -> Expr:
    """TRUNC toward zero (pairs with DuckDB TRUNC for float→int casts)."""
    return _Kernel(pc.trunc, _wrap(x))


def coalesce(*xs) -> Expr:
    return _Kernel(pc.coalesce, *[_wrap(x) for x in xs])


_EXTRACT = {
    "year": pc.year, "month": pc.month, "day": pc.day,
    "hour": pc.hour, "minute": pc.minute, "second": pc.second,
    "dow": pc.day_of_week, "doy": pc.day_of_year,
}


def extract(part: str, x) -> Expr:
    """EXTRACT(part FROM ts) (extract_expression.hpp:16).  The
    reference extracts from *string* dates; we upgrade to native
    timestamp columns per the input_hint schema (SURVEY.md §1.2)."""
    fn = _EXTRACT[part.lower()]
    return _Kernel(lambda a: pc.cast(fn(a), pa.int64()), _wrap(x))


# --- the reference's two FunctionExpressions (function_expression.hpp:8)
def substr(x, start, length) -> Expr:
    """SUBSTR(x, start, length) with FULL SQL semantics — negative /
    zero / past-end starts, zero / negative lengths, and (reference
    parity: FunctionExpression takes arbitrary argument expressions,
    function_expression.hpp:8) ``start``/``length`` may be column
    expressions, not just constants.

    Virtual-window rule (SQLite/DuckDB agree, verified against both):
    a negative start counts from the right (pos = n + start + 1), the
    window [pos, pos+length) is laid over virtual 1-based coordinates
    and intersected with the string; any NULL argument nulls the row.
    Byte-based (== character-based on ASCII, the reference test
    corpus' alphabet)."""
    if (isinstance(start, int) and isinstance(length, int)
            and start >= 1 and length >= 0):
        s = start - 1
        return _Kernel(
            lambda a: pc.utf8_slice_codeunits(a, s, s + length), _wrap(x))

    import numpy as np

    def _sub(a, s, L):
        all_scalar = all(isinstance(v, pa.Scalar) for v in (a, s, L))
        if isinstance(a, pa.Scalar):
            # broadcast a literal string to the batch length (or 1 for
            # an all-literal call, returned as a scalar below)
            m = next((len(v) for v in (s, L)
                      if not isinstance(v, pa.Scalar)), 1)
            a = pa.chunked_array([pa.array([a.as_py()] * m, pa.string())])
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        n = len(a)

        def _ints(v):
            if isinstance(v, pa.Scalar):
                py = v.as_py()
                if py is None:
                    return None, np.zeros(n, dtype=bool) | True
                return np.full(n, int(py), dtype=np.int64), \
                    np.zeros(n, dtype=bool)
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            v = pc.cast(v, pa.int64())
            nulls = pc.is_null(v).to_numpy(zero_copy_only=False)
            return v.fill_null(0).to_numpy(zero_copy_only=False), nulls

        s_np, s_null = _ints(s)
        L_np, L_null = _ints(L)
        a_null = pc.is_null(a).to_numpy(zero_copy_only=False) \
            if a.null_count else np.zeros(n, dtype=bool)
        af = pc.fill_null(a, "") if a.null_count else a
        bufs = af.buffers()
        off_dt = np.int64 if pa.types.is_large_string(af.type) else np.int32
        offs = np.frombuffer(bufs[1], dtype=off_dt)[
            af.offset: af.offset + n + 1].astype(np.int64)
        flat = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
            else np.empty(0, dtype=np.uint8)
        nb = np.diff(offs)
        if s_np is None:
            s_np = np.zeros(n, dtype=np.int64)
        if L_np is None:
            L_np = np.zeros(n, dtype=np.int64)
        pos = np.where(s_np < 0, nb + s_np + 1, s_np)
        b0 = pos - 1
        e0 = b0 + L_np
        b = np.clip(b0, 0, nb)
        e = np.clip(e0, 0, nb)
        e = np.maximum(e, b)
        out_len = e - b
        null_mask = a_null | s_null | L_null
        out_len = np.where(null_mask, 0, out_len)
        new_offs = np.concatenate([[0], np.cumsum(out_len)])
        total = int(new_offs[-1])
        src_start = offs[:-1] + b
        excl = new_offs[:-1]
        idx = np.arange(total, dtype=np.int64) + np.repeat(
            src_start - excl, out_len)
        data = flat[idx] if total else np.empty(0, dtype=np.uint8)
        validity = None
        if null_mask.any():
            validity = pa.array(~null_mask).buffers()[1]
        out = pa.StringArray.from_buffers(
            n, pa.py_buffer(new_offs.astype(np.int32).tobytes()),
            pa.py_buffer(data.tobytes()), validity,
            int(null_mask.sum()))
        return out[0] if all_scalar else out

    return _Kernel(_sub, _wrap(x), _wrap(start), _wrap(length))


def concat(*xs) -> Expr:
    """CONCAT(a, b, …) — NULL-propagating like SQL || chains."""
    exprs = [_wrap(x) for x in xs]

    def _cc(*arrays):
        arrays = [
            a if (isinstance(a, pa.Scalar) and pa.types.is_string(a.type))
            or (hasattr(a, "type") and pa.types.is_string(a.type))
            else pc.cast(a, pa.string())
            for a in arrays
        ]
        return pc.binary_join_element_wise(*arrays, "", null_handling="emit_null")

    return _Kernel(_cc, *exprs)
