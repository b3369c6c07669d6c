"""Engine-free Apache Hudi COPY-ON-WRITE reader: replay the timeline.

The Hudi spec (https://hudi.apache.org/tech-specs/) is public: a table
is parquet base files under partition paths plus a ``.hoodie/``
timeline of instants — ``<ts>.commit`` / ``<ts>.replacecommit`` JSON
files whose ``partitionToWriteStats`` lists the files each commit
wrote. COW semantics: an updated file group gets a NEW base file under
the same ``fileId``; the newest base file per file group IS the
snapshot. Replaying completed commits and keeping the latest slice per
fileId therefore yields the current table — plain
``spark.read.parquet`` scans it. Same replay-the-public-protocol
pattern as ``delta_lite``/``iceberg_lite``.

Supported: COW tables, multi-commit updates (latest file slice wins),
``replacecommit`` (clustering/insert-overwrite: replaced file groups
dropped via ``partitionToReplaceFileIds``), ``as-of=<ts>`` time travel
(instants up to ts). Raises clearly on MERGE-ON-READ tables (log files
need the Hudi runtime's merge machinery).
"""

from __future__ import annotations

import glob as _glob
import json
import os

from pyspark.sql import DataFrame, SparkSession


def is_hudi_table(table_path: str) -> bool:
    return os.path.isdir(os.path.join(table_path, ".hoodie"))


def _table_type(table_path: str) -> str:
    props = os.path.join(table_path, ".hoodie", "hoodie.properties")
    if os.path.exists(props):
        with open(props) as fh:
            for line in fh:
                line = line.strip()
                if line.startswith("hoodie.table.type="):
                    return line.split("=", 1)[1]
    return "COPY_ON_WRITE"


def _completed_instants(table_path: str) -> list[tuple[str, str, str]]:
    """[(timestamp, action, path)] for completed commits, sorted by ts.

    Hudi 0.x names completed instants ``<ts>.commit``; 1.x uses
    ``<ts>_<completion-ts>.commit``. Both parse here. ``.inflight`` /
    ``.requested`` markers are in-progress and skipped; timeline may
    live in ``.hoodie/`` (0.x) or ``.hoodie/timeline/`` (1.x).
    """
    out = []
    for sub in ("", "timeline"):
        tdir = os.path.join(table_path, ".hoodie", sub)
        # deltacommit = MOR writes (base files on insert, .log on
        # update); COW timelines simply have none
        for action in ("commit", "replacecommit", "deltacommit"):
            for p in _glob.glob(os.path.join(tdir, f"*.{action}")):
                name = os.path.basename(p)[: -(len(action) + 1)]
                ts = name.split("_")[0]
                if ts.isdigit():
                    out.append((ts, action, p))
    return sorted(out)


def _hive_style_partition(part: str) -> dict[str, str | None] | None:
    """``key=val[/key2=val2]`` partition path → {col: value}, or None
    for non-hive layouts (``2021/01/01``) where column names are
    unrecoverable from the path alone. The hive null sentinel (and its
    textual 'None' twin from this module's own writer) map to SQL NULL
    so ``IS NULL`` predicates prune correctly."""
    if not part:
        return {}
    out: dict[str, str | None] = {}
    for seg in part.strip("/").split("/"):
        if "=" not in seg:
            return None
        k, v = seg.split("=", 1)
        out[k] = None if v in ("__HIVE_DEFAULT_PARTITION__", "None") else v
    return out


def _prune_partitions(
    spark: SparkSession, parts: set[str], where: str
) -> set[str] | None:
    """Partition paths kept by ``where``, or None when pruning can't
    apply (non-hive layout / predicate doesn't bind). Evaluated
    Spark-side per DISTINCT partition path; values are strings from the
    path — Spark's implicit casts make ``part = 5`` style predicates
    behave as the engine would."""
    from pyspark.sql import functions as F

    parsed = {p: _hive_style_partition(p) for p in parts}
    if any(v is None for v in parsed.values()):
        return None
    cols = sorted({k for v in parsed.values() for k in v})
    if not cols:
        return None
    rows = [
        tuple([p] + [parsed[p].get(c) for c in cols]) for p in sorted(parts)
    ]
    schema = "__hudi_part string, " + ", ".join(f"`{c}` string" for c in cols)
    try:
        kept_df = spark.createDataFrame(rows, schema).filter(F.expr(where))
        kept_df.columns  # force analysis
        return {r["__hudi_part"] for r in kept_df.collect()}
    except Exception:
        return None


def read_hudi_lite(
    spark: SparkSession,
    table_path: str,
    as_of: str | None = None,
    view: str | None = None,
    where: str | None = None,
) -> DataFrame:
    """Snapshot read via timeline replay.

    ``view='read_optimized'`` opts a MERGE_ON_READ table into its
    documented read-optimized view: latest BASE files only, log files
    ignored (that is exactly Hudi's ``_ro`` table semantics — fresher
    un-compacted updates are not visible). Without the opt-in, MOR
    still raises: the snapshot view needs the Hudi runtime's log merge.

    ``where``: SQL predicate; hive-style partition paths
    (``key=val/...``) prune the FILE LIST before any footer is opened,
    and the predicate is always applied to rows as well.
    """
    ttype = _table_type(table_path)
    read_optimized = view == "read_optimized"
    if ttype != "COPY_ON_WRITE" and not read_optimized:
        raise NotImplementedError(
            f"hudi_lite reads COPY_ON_WRITE tables; {ttype} (merge-on-read) "
            "log-file merging needs the Hudi runtime. Pass "
            "view='read_optimized' (?view=read_optimized) for the "
            "base-file-only RO view."
        )
    instants = _completed_instants(table_path)
    if as_of is not None:
        instants = [i for i in instants if i[0] <= str(as_of)]
    if not instants:
        raise ValueError(
            f"no completed Hudi commits under {table_path}/.hoodie"
            + (f" at or before {as_of}" if as_of else "")
        )
    # latest file slice per (partition, fileId); replacecommits drop
    # whole file groups (clustering / insert_overwrite). In RO view,
    # .log.* write-stats (MOR delta files) are skipped — base files
    # (.parquet) are the view, per the spec's read-optimized contract.
    slices: dict[tuple[str, str], str] = {}
    for ts, action, path in instants:
        with open(path) as fh:
            commit = json.load(fh)
        if action == "replacecommit":
            for part, fids in (
                commit.get("partitionToReplaceFileIds") or {}
            ).items():
                for fid in fids:
                    slices.pop((part, fid), None)
        for part, stats in (commit.get("partitionToWriteStats") or {}).items():
            for st in stats:
                fid = st.get("fileId") or st["path"]
                rel = st["path"]
                if ".log." in os.path.basename(rel):
                    continue  # MOR log file: never part of the RO view
                slices[(part, fid)] = os.path.join(table_path, rel)
    if where:
        kept = _prune_partitions(spark, {p for p, _ in slices}, where)
        if kept is not None:
            slices = {k: v for k, v in slices.items() if k[0] in kept}
    files = sorted(set(slices.values()))
    missing = [f for f in files if not os.path.exists(f)]
    if missing:
        raise FileNotFoundError(
            f"hudi commit references missing base files: {missing[:3]}"
        )
    if not files:
        raise ValueError(
            f"hudi table {table_path} has no live base files"
            + (" matching the partition predicate" if where else "")
        )
    df = spark.read.parquet(*files)
    # drop Hudi's bookkeeping meta columns if present (the payload the
    # user wrote is everything after them)
    meta_cols = [c for c in df.columns if c.startswith("_hoodie_")]
    if meta_cols:
        df = df.drop(*meta_cols)
    return df.filter(where) if where else df


# --- engine-free WRITER (COW) ---------------------------------------------
# insert (new file groups per commit), insert_overwrite_table
# (replacecommit), and record-key UPSERT: affected file groups located
# by a distributed semi-join over _metadata.file_path (the lite
# stand-in for Hudi's bloom index) and rewritten as new file slices;
# untouched groups are never read past the key probe or rewritten.


def _upsert_rewrites(
    df: DataFrame,
    table_path: str,
    ts: str,
    commit_uuid: str,
    record_key: str,
    live: dict[tuple[str, str], str],
) -> dict[str, list[dict]]:
    """New file slices for the file groups an upsert touches.

    Location (which groups hold the incoming keys) is one distributed
    semi-join over ``_metadata.file_path`` — the lite stand-in for
    Hudi's bloom index; groups with no matching key are never read past
    that probe and never rewritten. The rewrite itself is one job:
    affected rows anti-joined against the incoming keys, repartitioned
    by file group so each group lands as exactly ONE new base file
    (a file slice is one base file per (fileId, instant)).
    Returns {partition: [write stats]} with the ORIGINAL fileIds, so
    latest-slice-wins replay hides the old slices.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    spark = df.sparkSession
    if not live:
        return {}
    # normalized absolute path -> (partition, fileId)
    loc: dict[str, tuple[str, str]] = {}
    for (part, fid), rel in live.items():
        loc[os.path.abspath(os.path.join(table_path, rel))] = (part, fid)
    norm_path = F.regexp_replace(
        F.col("_metadata.file_path"), "^file:/+", "/"
    )
    keys = df.select(F.col(record_key).alias("__k")).distinct()
    base = spark.read.parquet(*sorted(loc)).select(
        F.col(record_key).alias("__k"), norm_path.alias("__path")
    )
    affected = sorted(
        r["__path"]
        for r in base.join(keys, "__k", "left_semi")
        .select("__path")
        .distinct()
        .collect()
    )
    if not affected:
        return {}
    fid_of = {p: loc[p][1] for p in affected}
    mapping = F.create_map(
        *[F.lit(x) for p in affected for x in (p, fid_of[p])]
    )
    remaining = (
        spark.read.parquet(*affected)
        .withColumn("__fid", mapping[norm_path])
        .join(keys.withColumnRenamed("__k", record_key), record_key, "left_anti")
    )
    tmp = tempfile.mkdtemp(prefix="hudi_lite_upsert_")
    out: dict[str, list[dict]] = {}
    try:
        remaining.repartition("__fid").write.mode("overwrite").partitionBy(
            "__fid"
        ).parquet(tmp)
        for p in affected:
            part, fid = loc[p]
            fid_dir = os.path.join(tmp, f"__fid={fid}")
            new_name = f"{fid}_{ts}_{commit_uuid[:8]}.parquet"
            dst_dir = (
                os.path.join(table_path, part) if part else table_path
            )
            os.makedirs(dst_dir, exist_ok=True)
            dst = os.path.join(dst_dir, new_name)
            parts = (
                sorted(
                    f
                    for f in os.listdir(fid_dir)
                    if f.endswith(".parquet") and not f.startswith("_")
                )
                if os.path.isdir(fid_dir)
                else []
            )
            if parts:
                shutil.move(os.path.join(fid_dir, parts[0]), dst)
            else:
                # every row of this group was upserted away: the new
                # slice is an EMPTY base file (schema-only parquet)
                spark.createDataFrame([], df.schema).coalesce(1).write.mode(
                    "overwrite"
                ).parquet(fid_dir + "_empty")
                empty = next(
                    f
                    for f in os.listdir(fid_dir + "_empty")
                    if f.endswith(".parquet") and not f.startswith("_")
                )
                shutil.move(os.path.join(fid_dir + "_empty", empty), dst)
            out.setdefault(part, []).append(
                {
                    "fileId": fid,
                    "path": os.path.relpath(dst, table_path),
                    "numWrites": None,
                    "fileSizeInBytes": os.path.getsize(dst),
                }
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _table_partition_fields(table_path: str) -> list[str]:
    props = os.path.join(table_path, ".hoodie", "hoodie.properties")
    if os.path.exists(props):
        with open(props) as fh:
            for line in fh:
                line = line.strip()
                if line.startswith("hoodie.table.partition.fields="):
                    raw = line.split("=", 1)[1]
                    return [c for c in raw.split(",") if c]
    return []


def write_hudi_lite(
    df: DataFrame,
    table_path: str,
    mode: str = "append",
    record_key: str | None = None,
    partition_by: list[str] | None = None,
) -> str:
    """COW commit; returns the new instant timestamp.

    ``mode``: append | overwrite | upsert.
    - overwrite = replacecommit replacing ALL prior file groups
      (insert_overwrite_table).
    - upsert (requires ``record_key``): incoming rows REPLACE existing
      rows with the same key and insert the rest — COW semantics, no
      log files. Realized as: every file group containing a matching
      key gets a NEW file slice holding its rows minus the incoming
      keys (latest-slice-wins makes the old slice invisible), and the
      full incoming frame lands as a new file group — together exactly
      ``(old − keys) ∪ incoming``. Key-to-file-group location uses a
      distributed semi-join over ``_metadata.file_path`` (the lite
      stand-in for Hudi's bloom index); unaffected groups are NOT
      rewritten. Incoming keys must be unique (no precombine field) —
      duplicate keys raise instead of picking a silent winner.

    ``partition_by``: hive-style partitioning. Files land per
    partition value but — matching Hudi, which never strips partition
    columns — still CONTAIN the columns (the split uses shadow
    columns, dropped by partitionBy). The commit stats are keyed by
    the canonical ``col=val[/..]`` partition path, which is exactly
    what the reader's ``?where=`` pruning consumes. Recorded in
    hoodie.properties (``hoodie.table.partition.fields``); appends and
    upserts must keep the table's partitioning.
    """
    import uuid as _uuid

    if mode not in ("append", "overwrite", "upsert"):
        raise ValueError(
            f"hudi_lite mode must be append|overwrite|upsert, got {mode!r}"
        )
    if mode == "upsert" and not record_key:
        raise ValueError("hudi_lite upsert needs record_key=<column>")
    if mode == "upsert":
        from pyspark.sql import functions as F

        bad = (
            df.groupBy(record_key)
            .count()
            .filter(
                (F.col("count") > 1) | F.col(record_key).isNull()
            )
            .head(1)
        )
        if bad:
            raise ValueError(
                f"hudi_lite upsert: incoming {record_key!r} values must be "
                "unique and non-null (no precombine field is emulated); "
                f"first offender: {bad[0][0]!r}"
            )
    hoodie = os.path.join(table_path, ".hoodie")
    os.makedirs(hoodie, exist_ok=True)
    props = os.path.join(hoodie, "hoodie.properties")
    if not os.path.exists(props):
        with open(props, "w") as fh:
            fh.write(
                "hoodie.table.name=%s\nhoodie.table.type=COPY_ON_WRITE\n"
                % os.path.basename(os.path.normpath(table_path))
            )
            if partition_by:
                fh.write(
                    "hoodie.table.partition.fields=%s\n"
                    % ",".join(partition_by)
                )
    elif _table_type(table_path) != "COPY_ON_WRITE":
        raise NotImplementedError("hudi_lite writes COPY_ON_WRITE tables only")
    else:
        table_parts = _table_partition_fields(table_path)
        if partition_by is None:
            partition_by = table_parts or None
        elif list(partition_by) != table_parts:
            raise ValueError(
                f"partition_by={partition_by} != table partitioning "
                f"{table_parts}"
            )
    pcols = list(partition_by or [])
    missing_cols = [c for c in pcols if c not in df.columns]
    if missing_cols:
        raise ValueError(f"partition_by columns not in frame: {missing_cols}")

    prior = _completed_instants(table_path)
    # instants are ordered timestamps; derive the next one from the
    # prior tail so commits stay monotonic without wall-clock reads
    ts = f"{int(prior[-1][0]) + 1:014d}" if prior else f"{10**13:014d}"

    commit_uuid = _uuid.uuid4().hex
    data_dir = os.path.join(table_path, f"data_{ts}_{commit_uuid[:8]}")
    if pcols:
        # shadow columns drive the directory split so the REAL columns
        # stay in the data files (Hudi never strips partition columns)
        from pyspark.sql import functions as F
        from urllib.parse import unquote as _uq

        shadow = {c: f"__hp_{c}" for c in pcols}
        df2 = df
        for c, s in shadow.items():
            df2 = df2.withColumn(s, F.col(c))
        df2.write.partitionBy(*shadow.values()).parquet(data_dir)

        def _part_key(path: str) -> str:
            rel = os.path.relpath(os.path.dirname(path), data_dir)
            raw = {}
            for seg in ([] if rel == "." else rel.split(os.sep)):
                if "=" in seg:
                    k, v = seg.split("=", 1)
                    raw[k.removeprefix("__hp_")] = _uq(v)
            return "/".join(f"{c}={raw.get(c)}" for c in pcols)
    else:
        df.write.parquet(data_dir)

        def _part_key(path: str) -> str:
            return ""

    per_part: dict[str, list[dict]] = {}
    for f in sorted(
        _glob.glob(os.path.join(data_dir, "**", "*.parquet"), recursive=True)
    ):
        import pyarrow.parquet as _pq

        if _pq.ParquetFile(f).metadata.num_rows == 0:
            continue  # empty task outputs bloat the timeline for no rows
        rel = os.path.relpath(f, table_path)
        per_part.setdefault(_part_key(f), []).append({
            "fileId": f"fg-{_uuid.uuid4().hex[:12]}",
            "path": rel,
            "numWrites": None,
            "fileSizeInBytes": os.path.getsize(f),
        })
    body: dict = {"partitionToWriteStats": per_part or {"": []}}
    action = "commit"

    def _live_map() -> dict[tuple[str, str], str]:
        live: dict[tuple[str, str], str] = {}
        for pts, pact, ppath in prior:
            with open(ppath) as fh:
                c = json.load(fh)
            if pact == "replacecommit":
                for part, fids in (c.get("partitionToReplaceFileIds") or {}).items():
                    for fid in fids:
                        live.pop((part, fid), None)
            for part, sts in (c.get("partitionToWriteStats") or {}).items():
                for st in sts:
                    live[(part, st.get("fileId") or st["path"])] = st["path"]
        return live

    if mode == "overwrite" and prior:
        # replace every live file group as of the prior snapshot
        replaced: dict[str, list[str]] = {}
        for part, fid in _live_map():
            replaced.setdefault(part, []).append(fid)
        body["partitionToReplaceFileIds"] = replaced
        action = "replacecommit"
    elif mode == "upsert" and prior:
        rewrites = _upsert_rewrites(
            df, table_path, ts, commit_uuid, record_key, _live_map()
        )
        for part, sts in rewrites.items():
            body["partitionToWriteStats"].setdefault(part, []).extend(sts)
    # O_EXCL commit claim: two racing writers can't both win the instant
    commit_path = os.path.join(hoodie, f"{ts}.{action}")
    fd = os.open(commit_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    with os.fdopen(fd, "w") as fh:
        json.dump(body, fh)
    return ts


def delete_hudi_lite(
    spark: SparkSession,
    table_path: str,
    where: str,
) -> dict:
    """Copy-on-write DELETE: remove rows matching ``where``.

    Committed as a ``replacecommit`` — the affected file groups are
    replaced wholesale by new groups holding only their surviving rows
    (fully-emptied groups are replaced by nothing), which is exactly
    the shape Hudi's own delete/clustering actions take on a COW
    table. Hive-style partition paths prune the candidate FILE LIST
    before any footer opens; untouched file groups are never rewritten.
    Hudi base files physically contain partition columns, so the
    predicate binds directly — no literal restore needed.
    NULL-predicate rows are KEPT (SQL DELETE semantics).

    Returns ``{"files_rewritten", "files_added", "rows_deleted"}``.
    """
    import shutil
    import tempfile
    import uuid as _uuid

    from pyspark.sql import functions as F

    ttype = _table_type(table_path)
    if ttype != "COPY_ON_WRITE":
        raise NotImplementedError(
            f"delete_hudi_lite needs COPY_ON_WRITE; {ttype} deletes are "
            "log-file appends — the Hudi runtime's job"
        )
    instants = _completed_instants(table_path)
    if not instants:
        raise ValueError(f"no completed Hudi commits under {table_path}/.hoodie")
    slices: dict[tuple[str, str], str] = {}
    for _ts, action, path in instants:
        with open(path) as fh:
            commit = json.load(fh)
        if action == "replacecommit":
            for part, fids in (
                commit.get("partitionToReplaceFileIds") or {}
            ).items():
                for fid in fids:
                    slices.pop((part, fid), None)
        for part, stats in (commit.get("partitionToWriteStats") or {}).items():
            for st in stats:
                slices[(part, st.get("fileId") or st["path"])] = st["path"]
    candidates = dict(slices)
    kept_parts = _prune_partitions(spark, {p for p, _ in slices}, where)
    if kept_parts is not None:
        candidates = {k: v for k, v in slices.items() if k[0] in kept_parts}
    zero = {"files_rewritten": 0, "files_added": 0, "rows_deleted": 0}
    if not candidates:
        return zero

    loc: dict[str, tuple[str, str]] = {}  # abs path -> (part, fid)
    for (part, fid), rel in candidates.items():
        loc[os.path.abspath(os.path.join(table_path, rel))] = (part, fid)
    norm_path = F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/")
    pred = F.coalesce(F.expr(where), F.lit(False))
    counts = (
        spark.read.parquet(*sorted(loc))
        .withColumn("__file", norm_path)
        .filter(pred)
        .groupBy("__file")
        .count()
        .collect()
    )
    if not counts:
        return zero
    affected: list[str] = []
    for r in counts:
        if r["__file"] not in loc:
            raise RuntimeError(
                f"delete_hudi_lite: scanned file {r['__file']!r} missing "
                "from the timeline file list (path-normalization bug — "
                "refusing to commit a partial delete)"
            )
        affected.append(r["__file"])
    affected.sort()
    n_rows = sum(r["count"] for r in counts)

    prior_ts = instants[-1][0]
    ts = f"{int(prior_ts) + 1:014d}"
    commit_uuid = _uuid.uuid4().hex

    # one distributed rewrite: survivors of the affected groups, one
    # output file per group (repartition by group), moved into place
    mapping = F.create_map(
        *[F.lit(x) for p in affected for x in (p, loc[p][1])]
    )
    survivors = (
        spark.read.parquet(*affected)
        .withColumn("__fid", mapping[norm_path])
        .filter(~pred)
    )
    tmp = tempfile.mkdtemp(prefix="hudi_lite_delete_")
    per_part: dict[str, list[dict]] = {}
    replaced: dict[str, list[str]] = {}
    try:
        survivors.repartition("__fid").write.mode("overwrite").partitionBy(
            "__fid"
        ).parquet(tmp)
        for p in affected:
            part, fid = loc[p]
            replaced.setdefault(part, []).append(fid)
            fid_dir = os.path.join(tmp, f"__fid={fid}")
            pieces = (
                sorted(
                    f
                    for f in os.listdir(fid_dir)
                    if f.endswith(".parquet") and not f.startswith("_")
                )
                if os.path.isdir(fid_dir)
                else []
            )
            if not pieces:
                continue  # group fully deleted: replaced, nothing added
            import pyarrow.parquet as _pq

            new_fid = f"fg-{_uuid.uuid4().hex[:12]}"
            new_name = f"{new_fid}_{ts}_{commit_uuid[:8]}.parquet"
            dst_dir = os.path.join(table_path, part) if part else table_path
            os.makedirs(dst_dir, exist_ok=True)
            dst = os.path.join(dst_dir, new_name)
            if len(pieces) == 1:
                shutil.move(os.path.join(fid_dir, pieces[0]), dst)
            else:
                # repartition("__fid") puts a group in one task, so one
                # piece is the norm; concat defensively if not
                import pyarrow as _pa

                _pq.write_table(
                    _pa.concat_tables(
                        _pq.read_table(os.path.join(fid_dir, f))
                        for f in pieces
                    ),
                    dst,
                )
            if _pq.ParquetFile(dst).metadata.num_rows == 0:
                os.remove(dst)
                continue
            per_part.setdefault(part, []).append(
                {
                    "fileId": new_fid,
                    "path": os.path.relpath(dst, table_path),
                    "numWrites": None,
                    "fileSizeInBytes": os.path.getsize(dst),
                }
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    body = {
        "partitionToWriteStats": per_part or {"": []},
        "partitionToReplaceFileIds": replaced,
    }
    commit_path = os.path.join(
        table_path, ".hoodie", f"{ts}.replacecommit"
    )
    fd = os.open(commit_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    with os.fdopen(fd, "w") as fh:
        json.dump(body, fh)
    return {
        "files_rewritten": len(affected),
        "files_added": sum(len(v) for v in per_part.values()),
        "rows_deleted": n_rows,
    }
