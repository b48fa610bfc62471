"""Per-file bloom-filter data-skipping index — point-lookup pruning
for columns the physical layout does NOT cluster.

The stats manifest (operators/manifest.py) prunes on min/max ranges,
which only bites when the layout correlates the column with files
(z-order, partitioning, sort). A needle query on any OTHER column —
"fetch order N from a date-partitioned table" — matches every file's
[min, max] and degenerates to a full scan. The lakehouse answer
(Delta/Iceberg bloom filter indexes, Parquet bloom filters) is a tiny
per-file bloom over the column: the lookup tests k bits per file and
scans only the may-contain files; false positives cost only wasted
reads, never wrong results, because the scan re-applies the predicate
(the same only-skip-work contract as ``pruned_scan``).

Sizing is PER ROWS, not fixed: blooms only help while per-file
distinct count ≪ bit count, so ``build_bloom_index`` sizes the shared
bitset from the largest file (``bits_per_row`` bits each, k=4 double
hashing ⇒ fpp ≈ (1−e^(−k/bpr))^k, ~0.24% at bpr=16). A 128 MB file of
~1M rows costs ~2 MB of index — metadata-scale, like the manifest.

Build is one distributed pass: (input file, value) → k bit positions
(Kirsch-Mitzenmacher double hashing off two xxhash64 seeds) →
``bit_or`` partial aggregation per (file, 64-bit slot) → sparse
(slot, mask) entries per file. Everything JVM-native; probing is a
higher-order-function filter over the metadata-sized index frame.

No counterpart in the reference repo; this extends the engine's
table-format layer (ARCHITECTURE.md round-7/8) the same way the stats
manifest does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_K = 4  # probes per value (double hashing)


def _bits_for(max_rows: int, bits_per_row: int) -> int:
    bits = 1 << max(12, (max_rows * bits_per_row - 1).bit_length())
    return bits


def _positions(col: F.Column, bits: int, seed: int) -> F.Column:
    """array of K bit positions in [0, bits) for a value column."""
    h1 = F.xxhash64(col, F.lit(seed))
    h2 = F.xxhash64(col, F.lit(seed + 1))
    return F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(bits)) for i in range(_K)]
    )


def build_bloom_index(
    spark: SparkSession,
    files: list[str],
    col: str,
    bits_per_row: int = 16,
    seed: int = 77,
) -> tuple[DataFrame, int]:
    """→ ((file, entries array<struct<slot long, mask long>>), bits).

    ``entries`` is the sparse nonzero-slot representation of each
    file's bitset; ``bits`` (power of two, shared by all files, sized
    from the largest file) must be passed back to the probe. One scan
    of (col) per file, bit_or partially aggregated map-side — the
    exchange carries at most files × bits/64 rows.
    """
    if not files:
        raise ValueError("empty file list")
    df = spark.read.parquet(*files).select(
        # normalize the file:-scheme URI (file:/x or file:///x) to the
        # plain absolute path the caller's file lists / manifests use
        F.regexp_replace(F.input_file_name(), "^file:/+", "/").alias("file"),
        F.col(col).alias("_v"),
    ).where(F.col("_v").isNotNull())
    counts = df.groupBy("file").count().agg(F.max("count")).first()[0]
    bits = _bits_for(int(counts or 1), bits_per_row)
    idx = (
        df.select("file", F.explode(_positions(F.col("_v"), bits, seed)).alias("p"))
        .select(
            "file",
            (F.col("p") / 64).cast("long").alias("slot"),
            F.expr("shiftleft(1L, CAST(p % 64 AS INT))").alias("m"),
        )
        .groupBy("file", "slot")
        .agg(F.bit_or("m").alias("mask"))
        .groupBy("file")
        .agg(F.array_sort(F.collect_list(F.struct("slot", "mask"))).alias("entries"))
    )
    return idx, bits


def bloom_may_contain_files_df(
    spark: SparkSession,
    blooms: DataFrame,
    keys: DataFrame,
    kcol: str,
    seed: int = 77,
) -> list[str]:
    """Distributed probe: files (rows of ``blooms``: file, bits,
    entries) that may contain ANY value of ``keys[kcol]`` — nothing
    is collected to the driver until the final metadata-sized file
    list, so the probe scales to arbitrarily large change batches.
    ``blooms`` may mix bit sizes (one per build generation); probes
    are computed per distinct size."""
    sizes = [r["bits"] for r in blooms.select("bits").distinct().collect()]
    kd = keys.select(F.col(kcol).alias("_v")).where(
        F.col("_v").isNotNull()
    ).distinct()
    out: set[str] = set()
    for bits in sizes:
        grp = blooms.where(F.col("bits") == bits)
        probe = (
            kd.select(
                "_v",
                F.posexplode(_positions(F.col("_v"), int(bits), seed)),
            )
            .select(
                "_v",
                (F.col("col") / 64).cast("long").alias("slot"),
                F.expr("shiftleft(1L, CAST(col % 64 AS INT))").alias("m"),
            )
        )
        flat = grp.select(
            "file", F.explode("entries").alias("e")
        ).select("file", F.col("e.slot").alias("slot"), F.col("e.mask").alias("mask"))
        hits = (
            flat.join(F.broadcast(probe), "slot")
            .where((F.col("mask").bitwiseAND(F.col("m"))) != 0)
            .groupBy("file", "_v")
            .agg(F.count(F.lit(1)).alias("nhit"))
            .where(F.col("nhit") >= _K)
            .select("file")
            .distinct()
        )
        out.update(r["file"] for r in hits.collect())
    return sorted(out)


def bloom_may_contain_files(
    spark: SparkSession,
    index: DataFrame,
    values: list[object],
    bits: int,
    seed: int = 77,
) -> list[str]:
    """Files that may contain ANY of ``values`` (the IN-list point
    lookup). The probe positions are computed with the same JVM
    xxhash64 as the build (a one-row literal frame, broadcast), and
    membership is an ``exists`` over the sparse entries — all on the
    metadata-sized index frame."""
    if not values:
        return []
    # each value's positions, one row per (value, probe); a file
    # survives if SOME value has ALL K of its bits set
    rows = (
        spark.createDataFrame(
            [(i, v) for i, v in enumerate(values)],
            "vid int, _v " + ("string" if isinstance(values[0], str) else "long"),
        )
        .select("vid", F.posexplode(_positions(F.col("_v"), bits, seed)))
        .withColumnRenamed("col", "p")
        .select(
            "vid",
            (F.col("p") / 64).cast("long").alias("slot"),
            F.expr("shiftleft(1L, CAST(p % 64 AS INT))").alias("m"),
        )
    )
    hits = (
        F.broadcast(rows)
        .crossJoin(index)
        .withColumn(
            "hit",
            F.expr(
                "exists(entries, e -> e.slot = slot AND (e.mask & m) != 0)"
            ),
        )
        .groupBy("file", "vid")
        .agg(F.min(F.col("hit").cast("int")).alias("all_hit"))
        .where(F.col("all_hit") == 1)
        .select("file")
        .distinct()
    )
    return sorted(r["file"] for r in hits.collect())
