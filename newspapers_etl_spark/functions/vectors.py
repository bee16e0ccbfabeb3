"""Vector expressions over ArrayType(FloatType) embedding columns.

Built on ``F.zip_with`` / ``F.aggregate`` higher-order functions — JVM-side,
no Python round trip — so brute-force similarity scans stay in codegen.
All arithmetic is promoted to double before accumulation so results are
reproducible against a double-precision oracle and stable under reordering
at 100 TB partition counts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
