"""Vector column functions over ``array<float>`` embeddings.

Pure column expressions (`zip_with`/`aggregate`/`transform`) — the
dot product and norms run JVM-side inside codegen; no Python UDF per
row. The Pandas-UDF path exists separately in
``operators.similarity`` for the batched/NumPy variant.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    diff = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
    )
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v))


def random_projection_signature(
    vec: Column | str, planes: list[list[float]]
) -> Column:
    """SimHash-style LSH bucket id: sign bits against fixed hyperplanes.

    ``planes`` are driver-side constants (deterministic, seeded), so
    the whole signature is a codegen'd expression — at scale this is
    the bucketing key that turns O(n²) similarity search into a
    per-bucket join.

    Pass ``vec`` as a COLUMN NAME to take the single-`expr` fast
    path: the whole bits×dim plane matrix becomes one parsed SQL
    literal instead of bits·dim individual ``F.lit`` columns — the
    py4j-object-per-literal form cost ~0.5 s of plan-build per table
    (multi-table callers were spending 10+ s building plans before a
    single task ran). Bit maths are identical: per plane,
    Σ cast(x as double)·cast(y as double) in array order, sign bit,
    MSB-first fold into a BIGINT."""
    if isinstance(vec, str):
        mat = ",".join(
            "array(" + ",".join(f"{float(x)!r}D" for x in plane) + ")"
            for plane in planes
        )
        return F.expr(
            f"""aggregate(
              transform(array({mat}), p ->
                IF(aggregate(zip_with({vec}, p,
                             (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                             CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) >= 0,
                   1, 0)),
              CAST(0 AS BIGINT), (acc, b) -> acc * 2 + b)"""
        )
    bits = []
    for plane in planes:
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(F.when(dot(vec, arr) >= 0, F.lit(1)).otherwise(F.lit(0)))
    sig = F.lit(0).cast("long")
    for b in bits:
        sig = sig * 2 + b
    return sig
