"""Single-call literal-array constructors for model-in-the-plan columns.

Every literal-embedded model (centroids, codebooks, anchors, planes,
PCA components) used to enter the plan as ``F.array(*[F.lit(x) ...])``
— one py4j round-trip per element, ~0.6 ms each, so a 16x8 codebook
matrix cost ~1.5 s of pure driver time PER CONSTRUCTION and the
maintenance roundtrips construct several per query (measured with
cProfile: 4,476 ``F.lit`` calls and 2.8 s inside ``_encode`` alone on
``ivfapp``; guide §1 measure-first, §7.3 driver-side work).

These helpers render the same literal as ONE SQL string and make a
single ``F.expr`` call (~0.5 ms total, JVM parse included).  Values are
bit-exact: ``repr(float)`` is the shortest round-trip decimal and both
Python and the JVM parse it to the identical IEEE-754 double (verified
for denormals, -0.0, scientific notation and max-magnitude doubles);
non-finite values go through an explicit CAST.  Integral helpers mirror
``F.lit``'s INT-if-it-fits-else-BIGINT typing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INT32_MIN, _INT32_MAX = -(2**31), 2**31 - 1


def _d(x: float) -> str:
    x = float(x)
    if x != x:
        return "CAST('NaN' AS DOUBLE)"
    if x == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if x == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return f"{x!r}D"


def _non_empty(parts: list, what: str) -> list:
    """Empty literal arrays are always a caller bug here (an empty
    model): a bare ``array()`` parses as array<void> and fails — or
    silently mistypes — only DOWNSTREAM, unlike the F.array forms these
    helpers replaced which failed at analysis.  Fail at construction
    with a clear message instead (ADVICE r16)."""
    if not parts:
        raise ValueError(
            f"{what} literal is empty — callers must guard empty models "
            "before building literal-array expressions"
        )
    return parts


def sql_doubles(vals) -> str:
    """The ``array(...)`` SQL text of a double-array literal — for
    callers that splice literal models into a larger single-``F.expr``
    expression (one py4j call for the WHOLE scoring expression instead
    of one per lambda/element)."""
    return "array(" + ",".join(_non_empty([_d(x) for x in vals], "double-array")) + ")"


def lit_doubles(vals) -> Column:
    """``array<double>`` literal from an iterable of floats."""
    return F.expr(sql_doubles(vals))


def lit_double_matrix(rows) -> Column:
    """``array<array<double>>`` literal from an iterable of float rows
    (each row non-empty too — ``sql_doubles`` raises on one)."""
    return F.expr(
        "array("
        + ",".join(_non_empty([sql_doubles(r) for r in rows], "double-matrix"))
        + ")"
    )


def lit_ints(vals) -> Column:
    """``array<int>`` literal (every value must fit in int32 — the
    caller's ids/codes do; a stray wide value raises rather than
    silently widening the array type F.lit would also have kept)."""
    out = []
    for v in vals:
        v = int(v)
        if not (_INT32_MIN <= v <= _INT32_MAX):
            raise ValueError(f"lit_ints value {v} does not fit int32")
        out.append(str(v))
    return F.expr("array(" + ",".join(_non_empty(out, "int-array")) + ")")


def lit_longs(vals) -> Column:
    """``array<bigint>`` literal."""
    return F.expr(
        "array("
        + ",".join(_non_empty([f"{int(v)}L" for v in vals], "long-array"))
        + ")"
    )


def lit_id_vec_structs(pairs, id_field: str, vec_field: str) -> Column:
    """``array<struct<id_field:int, vec_field:array<double>>>`` literal
    from (id, vector) pairs — the shape every literal-embedded model
    (centroid set, anchor set) takes when the id rides along."""
    return F.expr(
        "array("
        + ",".join(
            f"named_struct('{id_field}',{int(i)},'{vec_field}',"
            + "array("
            + ",".join(_d(x) for x in v)
            + "))"
            for i, v in pairs
        )
        + ")"
    )
