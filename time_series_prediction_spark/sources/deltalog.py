"""Native Delta Lake TABLE READER — no delta-spark jars required.

The reference stores every inter-stage dataset as a Delta table
(reference ``src/demo/training.py:158``, ``notebooks/scoring.py:245``);
this image has no Delta jars, and the previous fallback read the
table directory as plain parquet — which on a REAL Delta table is
wrong (files removed by the log but not yet vacuumed would be read,
double-counting history). The Delta transaction log is an open,
published format (delta.io PROTOCOL.md), and reading a snapshot needs
only:

* list ``_delta_log/``: zero-padded ``<version>.json`` commits (one
  JSON action per line: ``add`` / ``remove`` / ``metaData`` /
  ``protocol``), optional ``<version>.checkpoint.parquet`` rollups
  and a ``_last_checkpoint`` pointer;
* reconstruct the snapshot: start from the newest checkpoint at or
  below the requested version, then replay the JSON commits after it
  — per file path, the LAST action wins (an ``add`` makes it live, a
  ``remove`` tombstones it);
* read exactly the live files; partition-column values come from each
  add's ``partitionValues`` (Delta does NOT store partition columns
  in the data files), typed via the ``metaData.schemaString`` Spark
  schema JSON.

Implemented protocol surface (round 9): deletion vectors (read AND
write — ``delta_delete``), column mapping 'name' mode, classic
multi-part checkpoints, v2 UUID-named checkpoints with sidecar files,
TIMESTAMP AS OF (in-commit timestamps preferred), and streaming-source
tailing (``delta_changes_since``). Protocol honesty: tables gated on
reader capabilities beyond these (column-mapping 'id' mode, variant
types, …) raise a clear error instead of returning silently wrong
rows.

Scale shape: the snapshot computation touches only the log (tiny JSON
+ one checkpoint parquet — the same metadata a real Delta reader
reads); the data scan is the pruned live-file list, grouped by
partition tuple so partition columns attach as literals. File paths
are URL-decoded per the spec.
"""

from __future__ import annotations

import json
import os
import re
import urllib.parse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from time_series_prediction_spark.sources.fsops import fs_for

_LOG_DIR = "_delta_log"

# reader features this module actually implements; anything else in a
# readerFeatures-gated table is an honest refusal
_SUPPORTED_READER_FEATURES = {
    "timestampNtz",  # plain type support — parquet reader handles it
    "deletionVectors",  # roaring-bitmap DV files/inline (this module)
    "columnMapping",  # 'name' mode (physical→logical rename)
    "v2Checkpoint",  # UUID-named checkpoints + sidecar files
    "inCommitTimestamp",  # commitInfo timestamps (version_at_timestamp)
}


class DeltaProtocolUnsupported(RuntimeError):
    """The table's protocol demands reader capabilities this native
    reader does not implement (deletion vectors, column mapping, …).
    Install delta-spark to read it; returning rows anyway would be
    silently wrong."""


def has_delta_log(spark: SparkSession, path: str) -> bool:
    """True when ``path`` carries ANY non-empty ``_delta_log``
    directory — including log layouts this reader cannot replay
    (multi-part ``<v>.checkpoint.<i>.<n>.parquet``, v2/UUID
    checkpoints, sidecars). This is the "is it a Delta table at all"
    test: a table whose log exists but is unreadable here must RAISE,
    never fall through to a plain-parquet scan that would include
    tombstoned files."""
    fs = fs_for(spark, path)
    log = os.path.join(path, _LOG_DIR)
    return fs.is_dir(log) and any(
        n == "_last_checkpoint"
        or (n[:20].isdigit() and (".json" in n or ".parquet" in n))
        for n in fs.list_names(log)
    )


_CP_MULTI = re.compile(
    r"^(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet$"
)
# v2 (UUID-named) checkpoint: <v>.checkpoint.<uniqueStr>.parquet where
# uniqueStr is NOT the numeric <i>.<n> multi-part shape
_CP_V2 = re.compile(r"^(\d{20})\.checkpoint\.([A-Za-z0-9_-]+)\.parquet$")


def _checkpoint_groups(names: list[str]) -> dict[int, list[str]]:
    """Usable checkpoints by version: classic single-part
    ``<v>.checkpoint.parquet``, COMPLETE multi-part
    ``<v>.checkpoint.<i>.<n>.parquet`` groups (all n parts present —
    a partial group is an in-flight or interrupted checkpoint write
    and must be ignored, exactly as real readers do), and v2
    UUID-named ``<v>.checkpoint.<uuid>.parquet`` checkpoints (their
    ``sidecar`` actions are resolved at replay time)."""
    out: dict[int, list[str]] = {}
    multi: dict[tuple[int, int], dict[int, str]] = {}
    for n in names:
        if n.endswith(".checkpoint.parquet") and n[:20].isdigit():
            out[int(n[:20])] = [n]
            continue
        m = _CP_MULTI.match(n)
        if m:
            v, i, total = int(m[1]), int(m[2]), int(m[3])
            multi.setdefault((v, total), {})[i] = n
            continue
        m2 = _CP_V2.match(n)
        if m2:
            # prefer classic if both exist for a version (setdefault
            # below keeps whichever landed first; either is complete)
            out.setdefault(int(m2[1]), [n])
    for (v, total), parts in multi.items():
        if len(parts) == total:
            out.setdefault(v, [parts[i] for i in sorted(parts)])
    return out


def is_delta_table(spark: SparkSession, path: str) -> bool:
    """True when ``path`` carries a Delta transaction log THIS reader
    can replay — classic ``<v>.json`` commits, single-part
    ``<v>.checkpoint.parquet`` rollups, or complete multi-part
    ``<v>.checkpoint.<i>.<n>.parquet`` groups (after log cleanup a
    long-lived table may be checkpoint-only; treating that as 'not a
    table' would restart the version counter at 0 and the snapshot
    replay would silently discard the new commits as pre-checkpoint
    history).

    Callers deciding "Delta vs plain parquet" must use
    ``has_delta_log`` instead and treat ``has_delta_log and not
    is_delta_table`` as an unsupported-layout ERROR — a real Delta
    table whose log holds only v2/UUID checkpoints is still a Delta
    table, and reading its data dir as parquet double-counts removed
    files."""
    fs = fs_for(spark, path)
    log = os.path.join(path, _LOG_DIR)
    if not fs.is_dir(log):
        return False
    names = fs.list_names(log)
    return any(
        n.endswith(".json") and n[:20].isdigit() for n in names
    ) or bool(_checkpoint_groups(names))


def _check_protocol(proto: dict) -> None:
    min_reader = int(proto.get("minReaderVersion", 1))
    if min_reader <= 2:
        # v2 adds column mapping, which this reader implements in
        # 'name' mode ('id' mode is refused at metaData time — the
        # mode lives in the table configuration, not the protocol)
        return
    feats = set(proto.get("readerFeatures") or [])
    if min_reader == 3 and feats <= _SUPPORTED_READER_FEATURES:
        return
    raise DeltaProtocolUnsupported(
        f"delta table requires minReaderVersion={min_reader} "
        f"readerFeatures={sorted(feats)}; this native reader supports "
        f"version ≤2 tables (and feature-gated tables using only "
        f"{sorted(_SUPPORTED_READER_FEATURES)})"
    )


def _apply_action(
    state: dict, action: dict, meta: list, txns: dict
) -> None:
    if "add" in action:
        a = action["add"]
        state[urllib.parse.unquote(a["path"])] = {
            "partitionValues": a.get("partitionValues") or {},
            "size": int(a.get("size") or 0),
            "modificationTime": int(a.get("modificationTime") or 0),
            "deletionVector": a.get("deletionVector"),
        }
    elif "remove" in action:
        r = action["remove"]
        state.pop(urllib.parse.unquote(r["path"]), None)
    elif "metaData" in action:
        meta[0] = action["metaData"]
    elif "protocol" in action:
        _check_protocol(action["protocol"])
    elif "txn" in action:
        tx = action["txn"]
        if tx.get("appId") is not None and tx.get("version") is not None:
            txns[tx["appId"]] = max(
                int(tx["version"]), txns.get(tx["appId"], -1)
            )


def delta_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> tuple[dict[str, dict], dict, int, dict[str, int]]:
    """Reconstruct the live-file snapshot of the Delta table at
    ``version`` (default: latest). Returns ``(files, metaData,
    version, txns)`` where ``files`` maps each live RELATIVE file
    path to its add payload (``partitionValues``, ``size``,
    ``modificationTime``, ``deletionVector``) and ``txns`` maps
    streaming appIds to
    their last committed transaction version (the protocol's ``txn``
    idempotence tokens). Only the log is touched — commit JSONs after
    the newest usable checkpoint, plus at most one checkpoint
    parquet."""
    fs = fs_for(spark, path)
    log = os.path.join(path, _LOG_DIR)
    names = fs.list_names(log)
    commits: dict[int, str] = {}
    for n in names:
        if n.endswith(".json") and n[:20].isdigit():
            commits[int(n[:20])] = os.path.join(log, n)
    checkpoints: dict[int, list[str]] = {
        v: [os.path.join(log, p) for p in parts]
        for v, parts in _checkpoint_groups(names).items()
    }
    if not commits and not checkpoints:
        raise ValueError(f"no delta log entries under {log}")
    latest = max(list(commits) + list(checkpoints))
    v = latest if version is None else version
    if version is not None and version > latest:
        raise ValueError(
            f"version {version} not committed (latest is {latest})"
        )
    state: dict[str, dict] = {}
    meta: list = [None]
    txns: dict[str, int] = {}
    start = 0
    usable_cp = [cv for cv in checkpoints if cv <= v]
    if usable_cp:
        cp_v = max(usable_cp)
        cp = spark.read.parquet(*checkpoints[cp_v])
        cols = set(cp.columns)
        sidecars: list[str] = []
        for row in cp.collect():
            d = row.asDict(recursive=True)
            for kind in ("protocol", "metaData", "add", "remove", "txn"):
                if kind in cols and d.get(kind) is not None:
                    _apply_action(state, {kind: d[kind]}, meta, txns)
            # v2 checkpoints move file actions into sidecar parquets
            # under _delta_log/_sidecars/ and reference them here
            if "sidecar" in cols and d.get("sidecar") is not None:
                sidecars.append(d["sidecar"]["path"])
        for sc in sidecars:
            sc_df = spark.read.parquet(
                os.path.join(log, "_sidecars", sc)
            )
            sc_cols = set(sc_df.columns)
            for row in sc_df.collect():
                d = row.asDict(recursive=True)
                for kind in ("add", "remove"):
                    if kind in sc_cols and d.get(kind) is not None:
                        _apply_action(
                            state, {kind: d[kind]}, meta, txns
                        )
        start = cp_v + 1
    for cv in range(start, v + 1):
        p = commits.get(cv)
        if p is None:
            if cv in checkpoints:
                continue  # checkpoint-only version
            raise ValueError(
                f"delta log is missing commit {cv} (log cleanup passed "
                "the requested version and no checkpoint covers it)"
            )
        for line in fs.read_text(p).splitlines():
            line = line.strip()
            if line:
                _apply_action(state, json.loads(line), meta, txns)
    if meta[0] is None:
        raise ValueError(
            f"delta log under {log} carries no metaData action"
        )
    return state, meta[0], v, txns


def version_at_timestamp(
    spark: SparkSession, path: str, ts_ms: int
) -> int:
    """TIMESTAMP AS OF resolution: the newest commit whose timestamp
    is ≤ ``ts_ms`` (epoch millis). A commit's timestamp is its
    ``commitInfo.inCommitTimestamp`` when present (the protocol's
    clock-skew-proof monotonic timestamps), else the commit file's
    modification time — the classic Delta rule. Raises when the
    timestamp predates the first retained commit — after log cleanup
    earlier history is gone, and silently answering with a later
    snapshot would be wrong."""
    fs = fs_for(spark, path)
    log = os.path.join(path, _LOG_DIR)
    stamps: list[tuple[int, int]] = []  # (version, commit_ts_ms)
    for n in fs.list_names(log):
        if n.endswith(".json") and n[:20].isdigit():
            p = os.path.join(log, n)
            st = fs.status(p)
            if st is None:
                continue
            ts = st[1]
            for line in fs.read_text(p).splitlines():
                if '"commitInfo"' not in line:
                    continue
                try:
                    ci = json.loads(line).get("commitInfo") or {}
                except ValueError:
                    continue
                ict = ci.get("inCommitTimestamp")
                if ict is not None:
                    ts = int(ict)
                break
            stamps.append((int(n[:20]), ts))
    if not stamps:
        raise ValueError(f"no delta commits under {log}")
    eligible = [v for v, m in stamps if m <= ts_ms]
    if not eligible:
        first_v, first_m = min(stamps)
        raise ValueError(
            f"timestamp {ts_ms} predates the first retained commit "
            f"(v{first_v} at {first_m}); earlier history was cleaned"
        )
    return max(eligible)


# --------------------------------------------------------------------
# Deletion vectors (PROTOCOL.md "Deletion Vectors"): per-file roaring
# bitmaps of deleted ROW POSITIONS, stored inline (z85 in the action),
# in a UUID-named sidecar under the table, or at an absolute path.
# The bitmap is the spec's 64-bit "RoaringBitmapArray" in PORTABLE
# serialization: <4B LE magic 1681511377><8B LE #bitmaps> then each
# 32-bit bitmap in the standard RoaringFormatSpec portable layout.
# Everything here is driver-side byte parsing — DVs are metadata-sized
# by design (cardinality counts, not row data).

_RBM_MAGIC = 1681511377
_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_MAP = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def _z85_decode(s: str) -> bytes:
    """ZeroMQ base-85 (the spec's encoding for inline DVs and DV-file
    UUIDs): 5 chars → 4 bytes, big-endian base-85."""
    if len(s) % 5:
        raise ValueError(f"z85 length {len(s)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i:i + 5]:
            v = v * 85 + _Z85_MAP[c]
        out += v.to_bytes(4, "big")
    return bytes(out)


def _z85_encode(data: bytes) -> str:
    """Inverse of ``_z85_decode`` (4 bytes → 5 chars, big-endian)."""
    if len(data) % 4:
        raise ValueError(f"z85 length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_ALPHABET[r])
        out.extend(reversed(chunk))
    return "".join(out)


def _serialize_roaring32(values: list[int]) -> bytes:
    """One 32-bit RoaringBitmap, portable serialization (no-run
    cookie; array containers ≤4096 values, bitset above)."""
    import struct

    by_key: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    n = len(keys)
    out = struct.pack("<I", 12346) + struct.pack("<I", n)
    for k in keys:
        out += struct.pack("<HH", k, len(by_key[k]) - 1)
    header_len = 4 + 4 + 4 * n + 4 * n
    offsets = b""
    containers = b""
    for k in keys:
        vals = by_key[k]
        offsets += struct.pack("<I", header_len + len(containers))
        if len(vals) <= 4096:
            containers += struct.pack(f"<{len(vals)}H", *vals)
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            containers += struct.pack("<1024Q", *words)
    return out + offsets + containers


def _serialize_roaring_bitmap_array(positions: list[int]) -> bytes:
    """Inverse of ``_parse_roaring_bitmap_array``: the spec's 64-bit
    portable RoaringBitmapArray. Bitmaps are positional (index =
    high 32 bits), so intermediate empty bitmaps are emitted."""
    import struct

    by_high: dict[int, list[int]] = {}
    for p in sorted(set(positions)):
        by_high.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    n_bitmaps = (max(by_high) + 1) if by_high else 0
    out = struct.pack("<i", _RBM_MAGIC) + struct.pack("<q", n_bitmaps)
    for h in range(n_bitmaps):
        out += _serialize_roaring32(by_high.get(h, []))
    return out


def _parse_roaring32(data: bytes, pos: int) -> tuple[list[int], int]:
    """One standard 32-bit RoaringBitmap (portable serialization):
    array / bitset / run containers. Returns (values, next_pos)."""
    import struct

    cookie, = struct.unpack_from("<I", data, pos)
    if (cookie & 0xFFFF) == 12347:  # SERIAL_COOKIE: run containers
        n = (cookie >> 16) + 1
        pos += 4
        nrb = (n + 7) // 8
        run_flags = data[pos:pos + nrb]
        pos += nrb
        has_offsets = n >= 4  # NO_OFFSET_THRESHOLD
    elif cookie == 12346:  # SERIAL_COOKIE_NO_RUNCONTAINER
        n, = struct.unpack_from("<I", data, pos + 4)
        pos += 8
        run_flags = bytes((n + 7) // 8)
        has_offsets = True
    else:
        raise DeltaProtocolUnsupported(
            f"unknown roaring bitmap cookie {cookie}"
        )
    keys, cards = [], []
    for _ in range(n):
        k, c = struct.unpack_from("<HH", data, pos)
        pos += 4
        keys.append(k)
        cards.append(c + 1)
    if has_offsets:
        pos += 4 * n  # offsets are redundant in a sequential parse
    values: list[int] = []
    for i in range(n):
        base = keys[i] << 16
        if (run_flags[i // 8] >> (i % 8)) & 1:  # run container
            n_runs, = struct.unpack_from("<H", data, pos)
            pos += 2
            for _ in range(n_runs):
                s0, ln = struct.unpack_from("<HH", data, pos)
                pos += 4
                values.extend(range(base + s0, base + s0 + ln + 1))
        elif cards[i] <= 4096:  # array container
            vals = struct.unpack_from(f"<{cards[i]}H", data, pos)
            pos += 2 * cards[i]
            values.extend(base + v for v in vals)
        else:  # bitset container: 1024 × 8-byte words
            for wi in range(1024):
                w, = struct.unpack_from("<Q", data, pos + wi * 8)
                off = base + wi * 64
                while w:
                    b = (w & -w).bit_length() - 1
                    values.append(off + b)
                    w &= w - 1
            pos += 8192
    return values, pos


def _parse_roaring_bitmap_array(data: bytes) -> list[int]:
    """The spec's 64-bit RoaringBitmapArray (portable): value v lives
    in 32-bit bitmap number v>>32 at low-word v & 0xFFFFFFFF."""
    import struct

    magic, = struct.unpack_from("<i", data, 0)
    if magic != _RBM_MAGIC:
        raise DeltaProtocolUnsupported(
            f"deletion-vector bitmap magic {magic} != {_RBM_MAGIC}"
        )
    n_bitmaps, = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[int] = []
    for high in range(n_bitmaps):
        vals, pos = _parse_roaring32(data, pos)
        base = high << 32
        out.extend(base | v for v in vals)
    return out


def _dv_positions(fs, table_path: str, dv: dict) -> list[int]:
    """Deleted row positions for one file's deletionVector descriptor:
    inline ('i', z85 bitmap in the action), UUID sidecar ('u',
    ``deletion_vector_<uuid>.bin`` under the table, optional random
    prefix), or absolute path ('p'). File-backed DVs carry a 1-byte
    format version, then at ``offset`` a 4-byte big-endian size, the
    bitmap, and a CRC-32 (big-endian) of the bitmap bytes."""
    import struct
    import uuid as _uuid
    import zlib

    st = dv["storageType"]
    if st == "i":
        return _parse_roaring_bitmap_array(
            _z85_decode(dv["pathOrInlineDv"])
        )
    if st == "u":
        enc = dv["pathOrInlineDv"]
        prefix, uuid_enc = enc[:-20], enc[-20:]
        u = _uuid.UUID(bytes=_z85_decode(uuid_enc))
        parts = [table_path] + ([prefix] if prefix else [])
        p = os.path.join(*parts, f"deletion_vector_{u}.bin")
    elif st == "p":
        p = dv["pathOrInlineDv"]
    else:
        raise DeltaProtocolUnsupported(
            f"deletion-vector storageType {st!r}"
        )
    raw = fs.read_bytes(p)
    off = int(dv.get("offset") or 0)
    size, = struct.unpack_from(">i", raw, off)
    data = raw[off + 4: off + 4 + size]
    crc, = struct.unpack_from(">I", raw, off + 4 + size)
    if (zlib.crc32(data) & 0xFFFFFFFF) != crc:
        raise ValueError(f"deletion-vector checksum mismatch in {p}")
    return _parse_roaring_bitmap_array(data)


def _column_mapping(meta: dict, schema: StructType) -> dict[str, str]:
    """logical → physical column names under column mapping. Empty
    dict = no mapping (physical == logical). 'id' mode (parquet
    field-id resolution) is refused honestly."""
    mode = (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none"
    )
    if mode in ("none", ""):
        return {}
    if mode != "name":
        raise DeltaProtocolUnsupported(
            f"columnMapping.mode={mode!r} (only 'name' is implemented)"
        )
    out = {}
    for f in schema.fields:
        md = f.metadata or {}
        out[f.name] = md.get("delta.columnMapping.physicalName", f.name)
    return out


def write_delta_log(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_cols: list[str] | None = None,
    txn: tuple[str, int] | None = None,
) -> int:
    """Write ``df`` as a Delta table WITHOUT the delta jars: land the
    data as parquet (UUID part files never clobber prior
    generations), then append one transaction-log commit — protocol
    v1 + metaData on the first commit, ``add`` actions for the new
    files (partition values parsed from their Hive-style paths), and
    for ``overwrite`` a ``remove`` for every previously-live file.
    The result reads back through ``read_delta_log`` AND through any
    real Delta reader (protocol 1 actions only). Returns the
    committed version.

    Single-writer discipline: the commit file is created for exactly
    the next version; concurrent writers racing the same table should
    coordinate upstream (the engine's own cow tables are the
    multi-writer path — this sink exists for interchange with Delta
    consumers, matching the reference's per-run overwrite usage,
    reference ``src/demo/training.py:70-90``)."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unsupported mode {mode!r}")
    spark = df.sparkSession
    fs = fs_for(spark, path)
    part_cols = list(partition_cols or [])
    prev_files: dict[str, dict] = {}
    next_v = 0
    if is_delta_table(spark, path):
        prev_files, prev_meta, latest, _txns = delta_snapshot(spark, path)
        next_v = latest + 1
        prev_parts = list(prev_meta.get("partitionColumns") or [])
        if part_cols != prev_parts:
            raise ValueError(
                f"partition columns {part_cols} != table's {prev_parts}"
            )
    from time_series_prediction_spark.operators.manifest import (
        _resolve_base,
        list_parquet_files,
    )

    base = _resolve_base(path, spark)
    before = set(list_parquet_files(path, spark))
    writer = df.write.mode("append")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(path)
    new_files = sorted(
        set(list_parquet_files(path, spark)) - before
    )
    actions: list[dict] = []
    if txn is not None:
        # the protocol's streaming idempotence token: readers expose
        # the last committed (appId -> version), so a replayed
        # micro-batch can be recognized and skipped
        actions.append(
            {"txn": {"appId": txn[0], "version": int(txn[1]),
                     "lastUpdated": 0}}
        )
    if next_v == 0:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
        actions.append(
            {
                "metaData": {
                    "id": "tsps-" + os.path.basename(base),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": part_cols,
                    "configuration": {},
                    "createdTime": 0,
                }
            }
        )
    if mode == "overwrite":
        for rel in sorted(prev_files):
            actions.append(
                {
                    "remove": {
                        "path": urllib.parse.quote(rel),
                        "deletionTimestamp": 0,
                        "dataChange": True,
                    }
                }
            )
    for f in new_files:
        rel = f[len(base) + 1:]
        pvals = {}
        for comp in rel.split("/")[:-1]:
            if "=" in comp:
                k, _, val = comp.partition("=")
                pvals[k] = urllib.parse.unquote(val)
        st = fs.status(f)
        actions.append(
            {
                "add": {
                    "path": urllib.parse.quote(rel),
                    "partitionValues": pvals,
                    "size": 0 if st is None else st[0],
                    "modificationTime": 0 if st is None else st[1],
                    "dataChange": True,
                }
            }
        )
    log = os.path.join(path, _LOG_DIR)
    fs.mkdirs(log)
    fs.write_text(
        os.path.join(log, f"{next_v:020d}.json"),
        "".join(json.dumps(a) + "\n" for a in actions),
    )
    return next_v


def delta_delete(spark: SparkSession, path: str, predicate: str) -> int:
    """DELETE FROM the native Delta table WHERE ``predicate`` — via
    protocol deletion vectors, no jars: matching ROW POSITIONS are
    found in one scan per partition group (parquet
    ``_metadata.file_path`` + ``row_index``), serialized as the
    spec's portable roaring bitmaps into ONE ``deletion_vector_<uuid>
    .bin`` sidecar (1-byte version, per-DV big-endian size + bitmap +
    CRC-32), and each touched file's ``add`` is re-committed carrying
    the DV descriptor. The commit upgrades the table protocol to
    reader v3 / writer v7 with the ``deletionVectors`` feature — the
    same upgrade delta-spark performs on first DV write. Files with
    an existing DV get the UNION of positions (re-pointed at the new
    sidecar). Returns the committed version (unchanged if nothing
    matched).

    Scale shape: the scan is distributed and returns only MATCHED
    (file, position) pairs to the driver — the scattered-delete path
    where positions are metadata-sized. A delete matching most of the
    table should rewrite (``write_delta_log`` overwrite) instead;
    that trade is the same one Delta's own DV writer documents.
    Column-mapped tables are refused (the predicate would need
    physical-name rewriting)."""
    import struct
    import uuid as _uuid
    import zlib

    files, meta, v, _txns = delta_snapshot(spark, path)
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    if _column_mapping(meta, schema):
        raise DeltaProtocolUnsupported(
            "DELETE on a column-mapped table is not implemented"
        )
    part_cols = list(meta.get("partitionColumns") or [])
    types = {f.name: f.dataType for f in schema.fields}
    fs = fs_for(spark, path)
    # group per (partition tuple, directory): filenames are unique
    # within one directory, so _metadata.file_name maps a matched row
    # back to its log-relative file unambiguously
    by_group: dict[tuple, list[str]] = {}
    for rel, add in files.items():
        key = tuple(add["partitionValues"].get(c) for c in part_cols)
        by_group.setdefault((key, os.path.dirname(rel)), []).append(rel)
    hits: dict[str, list[int]] = {}
    for (key, _dirn), rels in sorted(by_group.items()):
        base_map = {os.path.basename(r): r for r in rels}
        df = spark.read.parquet(
            *[os.path.join(path, r) for r in sorted(rels)]
        ).select(
            F.col("_metadata.file_name").alias("_fn"),
            F.col("_metadata.row_index").alias("_ri"),
            "*",
        )
        for c, raw in zip(part_cols, key):
            df = df.withColumn(
                c, F.lit(raw).cast(types[c]) if raw is not None
                else F.lit(None).cast(types[c])
            )
        matched = df.where(predicate).select("_fn", "_ri").collect()
        for r in matched:
            rel = base_map.get(r["_fn"])
            if rel is None:
                raise ValueError(
                    f"cannot map scanned file {r['_fn']} to a live file"
                )
            hits.setdefault(rel, []).append(int(r["_ri"]))
    if not hits:
        return v  # nothing matched: no commit burned
    # merge with any existing DV (re-deleting already-hidden rows is
    # a no-op union, and the old positions must not resurrect)
    for rel in hits:
        old = files[rel].get("deletionVector")
        if old:
            hits[rel] = sorted(
                set(hits[rel]) | set(_dv_positions(fs, path, old))
            )
    u = _uuid.uuid4()
    payload = bytearray(b"\x01")  # DV file format version
    descs: dict[str, dict] = {}
    for rel in sorted(hits):
        data = _serialize_roaring_bitmap_array(hits[rel])
        off = len(payload)
        payload += struct.pack(">i", len(data))
        payload += data
        payload += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
        descs[rel] = {
            "storageType": "u",
            "pathOrInlineDv": _z85_encode(u.bytes),
            "offset": off,
            "sizeInBytes": len(data),
            "cardinality": len(hits[rel]),
        }
    fs.write_bytes(
        os.path.join(path, f"deletion_vector_{u}.bin"), bytes(payload)
    )
    actions: list[dict] = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        }
    ]
    for rel in sorted(hits):
        add = files[rel]
        actions.append(
            {
                "remove": {
                    "path": urllib.parse.quote(rel),
                    "deletionTimestamp": 0,
                    "dataChange": True,
                }
            }
        )
        actions.append(
            {
                "add": {
                    "path": urllib.parse.quote(rel),
                    "partitionValues": add["partitionValues"],
                    "size": int(add.get("size") or 0),
                    "modificationTime": int(
                        add.get("modificationTime") or 0
                    ),
                    "dataChange": True,
                    "deletionVector": descs[rel],
                }
            }
        )
    log = os.path.join(path, _LOG_DIR)
    fs.write_text(
        os.path.join(log, f"{v + 1:020d}.json"),
        "".join(json.dumps(a) + "\n" for a in actions),
    )
    return v + 1


def read_delta_log(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a Delta table THROUGH its transaction log (``VERSION AS
    OF`` via ``version``): scan exactly the snapshot's live files and
    attach each file's partition-column literals, typed from the
    table schema. Files are grouped by partition tuple — one reader
    per distinct partition combination, unioned.

    Protocol features implemented natively:

    * **column mapping ('name' mode)** — data files and
      partitionValues carry PHYSICAL column names
      (``delta.columnMapping.physicalName`` field metadata); the scan
      selects physical names and aliases them back to the logical
      schema. 'id' mode is refused.
    * **deletion vectors** — a file carrying a ``deletionVector``
      descriptor scans with the parquet ``_metadata.row_index`` and
      anti-joins the DV's deleted positions (parsed driver-side from
      the roaring bitmap — DVs are metadata-sized by design).
    """
    files, meta, _v, _txns = delta_snapshot(spark, path, version)
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = list(meta.get("partitionColumns") or [])
    mapping = _column_mapping(meta, schema)  # logical -> physical
    if not files:
        return spark.createDataFrame([], schema)
    fs = fs_for(spark, path)
    types = {f.name: f.dataType for f in schema.fields}
    data_fields = [f.name for f in schema.fields if f.name not in part_cols]

    def _logical(df: DataFrame, key: tuple) -> DataFrame:
        sel = [
            F.col(mapping.get(c, c)).alias(c) if mapping else F.col(c)
            for c in data_fields
        ]
        out = df.select(*sel)
        for c, raw in zip(part_cols, key):
            # partitionValues are strings (null = missing); cast to
            # the declared type exactly like Spark's partition
            # discovery would
            out = out.withColumn(
                c, F.lit(raw).cast(types[c]) if raw is not None
                else F.lit(None).cast(types[c])
            )
        return out.select([f.name for f in schema.fields])

    by_part: dict[tuple, list[str]] = {}
    # DV'd files group per (partition tuple, directory): ONE scan per
    # group with (filename, row_index) anti-joined against the
    # union of the group's deleted positions — N DV'd files cost one
    # plan branch, not N. Filenames are unique within a directory by
    # filesystem law, so (filename, position) identifies a row.
    dv_groups: dict[tuple, dict[str, list[int]]] = {}
    for rel, add in files.items():
        pvals = add["partitionValues"]
        key = tuple(
            pvals.get(mapping.get(c, c)) for c in part_cols
        )
        f = os.path.join(path, rel)
        if add.get("deletionVector"):
            positions = _dv_positions(fs, path, add["deletionVector"])
            gk = (key, os.path.dirname(rel))
            dv_groups.setdefault(gk, {})[f] = positions
        else:
            by_part.setdefault(key, []).append(f)
    parts = []
    for key, flist in sorted(by_part.items()):
        parts.append(_logical(spark.read.parquet(*sorted(flist)), key))
    for (key, _dirn), group in sorted(dv_groups.items()):
        pos_rows = [
            (os.path.basename(p), pos)
            for p, plist in group.items()
            for pos in plist
        ]
        pos_df = spark.createDataFrame(pos_rows, "_fn string, _ri long")
        raw_df = (
            spark.read.parquet(*sorted(group))
            .select(
                F.col("_metadata.file_name").alias("_fn"),
                F.col("_metadata.row_index").alias("_ri"),
                "*",
            )
            .join(F.broadcast(pos_df), ["_fn", "_ri"], "left_anti")
            .drop("_fn", "_ri")
        )
        parts.append(_logical(raw_df, key))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def delta_changes_since(
    spark: SparkSession,
    path: str,
    from_version: int,
    ignore_deletes: bool = False,
) -> tuple[DataFrame | None, int]:
    """Incremental tail of the native Delta log — the streaming-source
    read: rows ADDED by commits ``from_version+1 .. latest``, plus the
    latest version to checkpoint. Returns ``(None, latest)`` when
    nothing new. Each data file is read exactly once across a
    correctly-checkpointed polling loop, so tailing cost is
    proportional to the NEW data, never the table.

    Matches Delta's streaming-source contract for non-append changes:
    a ``remove`` with ``dataChange`` (or a DV appearing/growing on an
    already-delivered file) means rows this tail already emitted were
    later deleted — silently continuing would leave the consumer with
    phantom rows, so it raises unless ``ignore_deletes`` (the
    ``ignoreDeletes`` option) is set. Optimize/compaction commits
    (``dataChange=false``) pass through silently in either mode.

    Scale shape: only the tail commits' JSON is parsed (no checkpoint
    reads, no table scan); the returned frame scans exactly the new
    files."""
    fs = fs_for(spark, path)
    log = os.path.join(path, _LOG_DIR)
    commits: dict[int, str] = {}
    for n in fs.list_names(log):
        if n.endswith(".json") and n[:20].isdigit():
            commits[int(n[:20])] = os.path.join(log, n)
    if not commits:
        raise ValueError(f"no delta commits under {log}")
    latest = max(commits)
    if latest <= from_version:
        return None, latest
    missing = [
        v for v in range(from_version + 1, latest + 1)
        if v not in commits
    ]
    if missing:
        raise ValueError(
            f"log cleanup removed commits {missing}; this tail's "
            "history is gone — restart the consumer from a snapshot"
        )
    # the tail needs the table metaData for schema/partitions; read it
    # from the full snapshot resolution (cheap: log-sized)
    _files, meta, _v, _txns = delta_snapshot(spark, path, latest)
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    if _column_mapping(meta, schema):
        raise DeltaProtocolUnsupported(
            "tailing a column-mapped table is not implemented"
        )
    part_cols = list(meta.get("partitionColumns") or [])
    types = {f.name: f.dataType for f in schema.fields}
    new_adds: dict[str, dict] = {}
    removed_in_window: set[str] = set()
    for cv in range(from_version + 1, latest + 1):
        for line in fs.read_text(commits[cv]).splitlines():
            line = line.strip()
            if not line:
                continue
            action = json.loads(line)
            if "remove" in action:
                r = action["remove"]
                rel = urllib.parse.unquote(r["path"])
                if rel in new_adds:
                    # added and removed within this tail window:
                    # rewrite churn, rows never delivered — drop it
                    new_adds.pop(rel)
                    continue
                removed_in_window.add(rel)
                if r.get("dataChange", True) and not ignore_deletes:
                    raise ValueError(
                        f"commit {cv} deletes data from already-"
                        "delivered files (remove with dataChange) — "
                        "a pure tail cannot express deletes; pass "
                        "ignore_deletes=True to skip them, or consume "
                        "the change feed instead"
                    )
            elif "add" in action:
                a = action["add"]
                rel = urllib.parse.unquote(a["path"])
                if a.get("deletionVector") and not ignore_deletes:
                    raise ValueError(
                        f"commit {cv} attaches a deletion vector — "
                        "rows already delivered were deleted; pass "
                        "ignore_deletes=True to skip, or consume the "
                        "change feed instead"
                    )
                if rel in removed_in_window:
                    # a re-add of a pre-window file (DV attach or
                    # rewrite): its rows were already delivered —
                    # re-emitting them would duplicate; under
                    # ignore_deletes the tail skips the change
                    continue
                if a.get("dataChange", True):
                    new_adds[rel] = a
    if not new_adds:
        return None, latest
    by_part: dict[tuple, list[str]] = {}
    for rel, a in new_adds.items():
        key = tuple(
            (a.get("partitionValues") or {}).get(c) for c in part_cols
        )
        by_part.setdefault(key, []).append(os.path.join(path, rel))
    data_fields = [
        f.name for f in schema.fields if f.name not in part_cols
    ]
    parts = []
    for key, flist in sorted(by_part.items()):
        df = spark.read.parquet(*sorted(flist)).select(*data_fields)
        for c, raw in zip(part_cols, key):
            df = df.withColumn(
                c, F.lit(raw).cast(types[c]) if raw is not None
                else F.lit(None).cast(types[c])
            )
        parts.append(df.select([f.name for f in schema.fields]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out, latest


def write_checkpoint(
    spark: SparkSession, path: str, clean_old_commits: bool = False
) -> int:
    """Roll the current snapshot into a ``<version>.checkpoint.parquet``
    (one row per action: protocol, metaData, live adds, txn tokens)
    plus the ``_last_checkpoint`` pointer — after which snapshot
    reconstruction reads ONE parquet and only the commits past it,
    however many micro-batches the log has accumulated.
    ``clean_old_commits`` then deletes the JSON commits the
    checkpoint supersedes (log retention; time travel before the
    checkpoint is gone, exactly Delta's own cleanup trade). Returns
    the checkpointed version."""
    files, meta, v, txns = delta_snapshot(spark, path)
    rows = [
        ({"minReaderVersion": 1, "minWriterVersion": 2},
         None, None, None),
        (None, {
            "id": meta.get("id", "tsps"),
            "format": {"provider": "parquet"},
            "schemaString": meta["schemaString"],
            "partitionColumns": list(meta.get("partitionColumns") or []),
        }, None, None),
    ]
    for rel in sorted(files):
        add = files[rel]
        # size / modificationTime are protocol-REQUIRED in checkpoint
        # add structs, and dataChange=false marks checkpoint entries as
        # state (not new data) — without these a real delta-spark
        # reader can refuse the checkpoint after clean_old_commits
        # deleted the JSON history it would otherwise fall back to.
        rows.append((None, None, {
            "path": urllib.parse.quote(rel),
            "partitionValues": add["partitionValues"],
            "size": int(add.get("size") or 0),
            "modificationTime": int(add.get("modificationTime") or 0),
            "dataChange": False,
        }, None))
    for app, ver in sorted(txns.items()):
        rows.append((None, None, None, {"appId": app, "version": ver}))
    cp_schema = (
        "protocol struct<minReaderVersion:int, minWriterVersion:int>, "
        "metaData struct<id:string, format:struct<provider:string>, "
        "schemaString:string, partitionColumns:array<string>>, "
        "add struct<path:string, partitionValues:map<string,string>, "
        "size:long, modificationTime:long, dataChange:boolean>, "
        "txn struct<appId:string, version:long>"
    )
    log = os.path.join(path, _LOG_DIR)
    cp_tmp = os.path.join(log, f".cp-{os.getpid()}")
    spark.createDataFrame(rows, cp_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(cp_tmp)
    fs = fs_for(spark, path)
    part = next(
        n for n in fs.list_names(cp_tmp) if n.endswith(".parquet")
    )
    fs.replace_file(
        os.path.join(cp_tmp, part),
        os.path.join(log, f"{v:020d}.checkpoint.parquet"),
    )
    fs.delete(cp_tmp)
    fs.write_text(
        os.path.join(log, "_last_checkpoint"),
        json.dumps({"version": v, "size": len(rows)}),
    )
    if clean_old_commits:
        for n in list(fs.list_names(log)):
            if n.endswith(".json") and n[:20].isdigit()                     and int(n[:20]) <= v:
                fs.delete(os.path.join(log, n))
    return v


def delta_stream_sink(
    path: str,
    app_id: str,
    partition_cols: list[str] | None = None,
    checkpoint_interval: int | None = None,
    clean_old_commits: bool = False,
):
    """``foreachBatch`` body appending each micro-batch to a native
    Delta table EXACTLY-ONCE: every commit carries the protocol's
    ``txn`` action (appId, batch_id), and a replayed batch — Structured
    Streaming re-runs the last batch after a crash — is recognized by
    its already-committed transaction version and skipped instead of
    appended twice. This is the same idempotence contract the real
    delta-spark streaming sink implements; any Delta reader sees an
    exactly-once table.

    ``checkpoint_interval=N`` rolls the log into a checkpoint parquet
    every N commits (optionally deleting the superseded JSON commits)
    so a long-lived stream's snapshot reconstruction stays O(N), not
    O(total batches)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if is_delta_table(spark, path):
            _files, _meta, _v, txns = delta_snapshot(spark, path)
            if txns.get(app_id, -1) >= batch_id:
                return  # replayed batch: already committed
        v = write_delta_log(
            batch_df, path, mode="append",
            partition_cols=partition_cols, txn=(app_id, batch_id),
        )
        if checkpoint_interval and v and v % checkpoint_interval == 0:
            write_checkpoint(
                spark, path, clean_old_commits=clean_old_commits
            )

    return _sink
