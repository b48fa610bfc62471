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

# Bounded driver probe (guide §5 / the components.py driverEdgeCap
# discipline): the index is one row PER FILE, so at 100 TB file counts
# the Arrow toPandas pull is O(files), not metadata-sized. Indexes up
# to this many rows take the zero-job driver path; larger ones fall
# back to the distributed probe. 0 disables the driver path outright.
DRIVER_FILE_CAP_CONF = "spark.tsp.bloom.driverFileCap"
_DRIVER_FILE_CAP_DEFAULT = 100_000

# xxHash64 primes (public spec; Spark's XXH64 uses the same values)
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _hash_long_lane(value: int, seed: int) -> int:
    """One 8-byte xxHash64 lane + avalanche (``XXH64.hashLong`` of
    the public spec / Spark's XXH64.java), unsigned-in, unsigned-out."""
    v = value & _M64
    h = (seed + _P5 + 8) & _M64
    k1 = _rotl64((v * _P2) & _M64, 31) * _P1 & _M64
    h ^= k1
    h = (_rotl64(h, 27) * _P1 + _P4) & _M64
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _hash_int_lane(value: int, seed: int) -> int:
    """One 4-byte xxHash64 lane + avalanche (``XXH64.hashInt``)."""
    h = (seed + _P5 + 4) & _M64
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M64
    h = (_rotl64(h, 23) * _P2 + _P3) & _M64
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _xxh64_long(value: int, seed: int) -> int:
    """What Spark's ``xxhash64(longCol, lit(seed))`` computes: the
    EXPRESSION hashes every argument as a column, folding the running
    hash in as the next lane's seed starting from the expression's
    fixed seed 42 — and a Python-int literal binds as IntegerType, so
    the chain is hashInt(seed, hashLong(value, 42)), NOT
    hashLong(value, seed). Returns the signed int64 Spark returns;
    bit-equality against the JVM is pinned in tests/test_cow_bloom.py."""
    h = _hash_long_lane(value & _M64, 42)
    h = _hash_int_lane(seed, h)
    return h - (1 << 64) if h >= (1 << 63) else h


def _positions_py(value: int, bits: int, seed: int) -> list[int]:
    """Driver-side twin of ``_positions`` for integer values — the
    same K Kirsch-Mitzenmacher positions from the same two xxhash64
    draws, with Java int64 wraparound and pmod semantics."""
    h1 = _xxh64_long(value, seed)
    h2 = _xxh64_long(value, seed + 1)
    out = []
    for i in range(_K):
        s = (h1 + i * h2) & _M64
        s = s - (1 << 64) if s >= (1 << 63) else s  # signed wrap
        out.append(s % bits if bits > 0 else 0)  # python % == pmod
    return out


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
    # the index is METADATA-SIZED by construction (sparse slots per
    # file), and an IN-list is a bounded key panel — so the probe
    # runs driver-side with ZERO Spark jobs for integer keys: bit
    # positions come from the Python xxhash64 twin (bit-equality with
    # the JVM pinned in tests), index rows arrive via one Arrow
    # toPandas, and the all-K-bits test is plain dict lookups. The
    # r14 measurements: every DataFrame-shaped probe (crossJoin +
    # exists HOF, explode + equi-join, or even a 5-row
    # createDataFrame→collect) paid 0.6-1.5 s of fixed job/RPC
    # overhead per lookup regardless of data size. r15: the pull is
    # CAPPED — the index is one row per FILE, so at 100 TB file
    # counts it is O(files), not metadata-sized; a limit(cap+1)
    # collect bounds driver memory and anything larger keeps the
    # distributed ``bloom_may_contain_files_df`` path
    # (r14 VERDICT Next #5).
    cap = int(
        spark.conf.get(DRIVER_FILE_CAP_CONF, str(_DRIVER_FILE_CAP_DEFAULT))
    )
    pidx = (
        index.select("file", "entries").limit(cap + 1).toPandas()
        if cap > 0
        else None
    )
    if pidx is None or len(pidx) > cap:
        # index bigger than the driver budget (or driver path disabled):
        # distributed probe, identical all-K-bits semantics
        ktype = (
            "long" if all(isinstance(v, int) for v in values) else "string"
        )
        keys = spark.createDataFrame([(v,) for v in values], f"_v {ktype}")
        return bloom_may_contain_files_df(
            spark,
            index.withColumn("bits", F.lit(int(bits))),
            keys,
            "_v",
            seed=seed,
        )
    if all(isinstance(v, int) for v in values):
        pos_lists = [_positions_py(v, bits, seed) for v in values]
    else:  # string keys: JVM hash via one narrow job
        pos_lists = [
            r["ps"]
            for r in spark.createDataFrame(
                [(v,) for v in values], "_v string"
            )
            .select(_positions(F.col("_v"), bits, seed).alias("ps"))
            .collect()
        ]
    out = []
    for file, entries in zip(pidx["file"], pidx["entries"]):
        masks = {e["slot"]: e["mask"] for e in entries}
        for ps in pos_lists:
            # Python ints are two's-complement under &, so negative
            # int64 masks test bit 63 correctly
            if all(masks.get(p // 64, 0) & (1 << (p % 64)) for p in ps):
                out.append(file)
                break
    return sorted(out)
