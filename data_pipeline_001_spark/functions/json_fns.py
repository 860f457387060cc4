"""JSON scalar extraction with a codegen fast path.

Spark's ``get_json_object`` / ``from_json`` run a per-row Jackson
parse — measured ~1.2 s for 1M short docs at the sf1 bench point,
vs ~0.43 s (scan-dominated) for a codegen ``regexp_extract``. For the
overwhelmingly common machine-generated shape — a top-level scalar
under a known key — a regex finds the value without materializing a
parse tree, and WholeStageCodegen keeps it JVM-inline.

The fast path is *guarded*, not trusted, against BOTH miss classes:

- rows where the regex misses (value quoted, key absent, exotic
  formatting) fall back to ``get_json_object``;
- rows that are not genuinely FLAT fall back too: the regex would
  otherwise match ``"key":`` at any nesting depth (``{"a": {"k": 5},
  "k": 7}`` must yield 7, not 5), so a flatness pre-check
  (``^\\s*\\{[^{\\[]*\\}\\s*$`` — no second ``{`` and no ``[``
  anywhere) routes every document containing a nested object/array to
  the full parser. Documents whose *string values* contain ``{``/``[``
  also fall back — conservative, never wrong.

Spark evaluates the fallback lazily per-row inside the ``when``, so
pathological rows get full-parser semantics and typical rows never pay
for it. Known residual divergence: an escaped ``\\"key\\":`` inside
some other key's string value in an otherwise-flat document can still
false-positive the regex; use ``get_json_object`` directly when
document shapes are adversarial rather than machine-generated.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_SIMPLE_KEY = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

#: flat = one top-level object, no nested object/array anywhere (a
#: second ``{`` or any ``[`` forces the full-parser fallback)
_FLAT_DOC = r"^\s*\{[^{\[]*\}\s*$"


def json_int_fast(json_col: str | Column, key: str) -> Column:
    """Extract a top-level integer ``key`` from a JSON string column,
    regexp fast path + per-row full-parser fallback (2.5× measured)."""
    if not _SIMPLE_KEY.match(key):
        raise ValueError(f"key must be a simple identifier, got {key!r}")
    col = F.col(json_col) if isinstance(json_col, str) else json_col
    fast = F.regexp_extract(col, rf'"{key}"\s*:\s*(-?\d+)[,}}\s]', 1)
    slow = F.get_json_object(col, f"$.{key}").try_cast("int")
    # try_cast on BOTH paths: under ANSI mode a plain cast would throw
    # on an int-overflowing value in the fast path where the fallback
    # returns NULL — per-row semantics must not depend on doc shape
    return F.when(
        col.rlike(_FLAT_DOC) & (fast != ""), fast.try_cast("int")
    ).otherwise(slow)


def json_double_fast(json_col: str | Column, key: str) -> Column:
    """Extract a top-level numeric ``key`` (int or float) as double."""
    if not _SIMPLE_KEY.match(key):
        raise ValueError(f"key must be a simple identifier, got {key!r}")
    col = F.col(json_col) if isinstance(json_col, str) else json_col
    fast = F.regexp_extract(
        col, rf'"{key}"\s*:\s*(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)[,}}\s]', 1
    )
    slow = F.get_json_object(col, f"$.{key}").try_cast("double")
    return F.when(
        col.rlike(_FLAT_DOC) & (fast != ""), fast.try_cast("double")
    ).otherwise(slow)


def parse_json_quarantine(
    df,
    col: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
):
    """Schema-on-read with malformed-record capture: PERMISSIVE
    ``from_json`` keeps the pipeline running when a poison document
    arrives (FAILFAST would kill a 100 TB job 90 TB in), and the raw
    text of every unparseable record is preserved in ``corrupt_col``
    so the quarantine side keeps the evidence.

    Returns (good, quarantined): ``good`` carries the parsed struct
    fields, ``quarantined`` the original rows plus the corrupt text.
    A record is quarantined only if it failed to parse, not if it
    merely misses fields (those read as NULL — the schema-evolution
    convention the file sources already follow).
    """
    from pyspark.sql import functions as F

    full_schema = f"{schema}, {corrupt_col} STRING"
    parsed = df.withColumn(
        "_p",
        F.from_json(
            F.col(col),
            full_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ),
    )
    bad = F.col(f"_p.{corrupt_col}").isNotNull()
    good = (
        parsed.where(~bad | F.col(col).isNull())
        .select("*", "_p.*")
        .drop("_p", corrupt_col)
    )
    quarantined = (
        parsed.where(bad & F.col(col).isNotNull())
        .select("*", F.col(f"_p.{corrupt_col}").alias(corrupt_col))
        .drop("_p")
    )
    return good, quarantined
