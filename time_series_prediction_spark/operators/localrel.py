"""Small driver-side row sets as VALUES-literal LocalRelations.

``spark.createDataFrame(list, schema)`` builds an RDD-backed relation
(``applySchemaToPythonRDD``): EVERY downstream action re-runs a
parallelize job through a Python worker just to produce a handful of
rows. A ``VALUES``-literal ``spark.sql`` relation is a LocalTableScan
instead — broadcast builds and collects over it run zero extra jobs
(guide §1.2/§5: metadata-sized state should cost metadata).

Scope: scalar columns only (string / integral / boolean), bounded row
counts (the SQL text is parsed by Catalyst — cap well below anything
data-proportional). Callers with bigger or richer rows keep
``createDataFrame``.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession

# above this many rows the one-time parse cost of the SQL text
# outweighs the per-action RDD job it saves
MAX_VALUES_ROWS = 2_000

_INT_TYPES = {"int", "integer", "bigint", "long", "smallint", "tinyint"}


def _parse_ddl(schema_ddl: str) -> list[tuple[str, str]]:
    cols = []
    for part in schema_ddl.split(","):
        name, typ = part.strip().split()
        cols.append((name, typ.lower()))
    return cols


def _lit(v, typ: str) -> str:
    if v is None:
        return f"CAST(NULL AS {typ})"
    if typ == "string":
        s = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{s}'"
    if typ == "boolean":
        return "true" if v else "false"
    if typ in _INT_TYPES:
        return f"CAST({int(v)} AS {typ})"
    if typ == "double":
        import math

        f = float(v)
        if math.isnan(f):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(f):
            return f"CAST('{'-' if f < 0 else ''}Infinity' AS DOUBLE)"
        # repr() is the shortest exact round-trip decimal; Double
        # parsing yields the identical IEEE value
        return f"CAST({f!r} AS DOUBLE)"
    raise ValueError(f"unsupported VALUES type: {typ}")


def local_rows_df(
    spark: SparkSession,
    rows: Iterable[Sequence],
    schema_ddl: str,
) -> DataFrame:
    """A DataFrame over ``rows`` with ``schema_ddl`` (e.g.
    ``"file string, n bigint"``) as a VALUES LocalRelation when the
    rows are scalar and few, else a plain ``createDataFrame``.
    Results are identical either way; only the physical source node
    differs (LocalTableScan vs Scan ExistingRDD)."""
    rows = list(rows)
    cols = _parse_ddl(schema_ddl)
    if rows and len(rows) <= MAX_VALUES_ROWS:
        try:
            body = ", ".join(
                "(" + ", ".join(
                    _lit(v, typ) for v, (_n, typ) in zip(r, cols)
                ) + ")"
                for r in rows
            )
            names = ", ".join(n for n, _t in cols)
            # NOTE: VALUES infers tighter (non-nullable) columns where
            # no NULL literal appears — strictly-true information;
            # unions reconcile nullability, so consumers see identical
            # data and compatible schemas.
            return spark.sql(
                f"SELECT * FROM (VALUES {body}) AS t({names})"
            )
        except (ValueError, TypeError):
            pass
    return spark.createDataFrame(rows, schema_ddl)
