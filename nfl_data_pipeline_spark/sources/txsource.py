"""The transactional table (jobs/txlog.py) as a first-class Spark
data source via the Python DataSource API (Spark 4, SPARK-44076 line
of work) — all four surfaces: ``spark.read`` / ``readStream`` /
``write`` / ``writeStream.format("txtable")``.

Why this exists when ``TxTable.read`` already returns a DataFrame:
the handle API requires the CALLER to thread partitions/ranges into
the read; this source hands that job to Catalyst — a plain
``.filter()`` on the loaded DataFrame is pushed down by the planner
(``pushFilters``) and becomes MANIFEST-level file skipping before a
single task launches:

- scan parallelism = one input partition per live manifest file;
- ``EqualTo``/``In`` on the table's hive-partition column prune at
  the manifest partition level;
- comparison filters on stats-bearing columns prune by per-file
  min/max (the ``ranges=`` machinery);
- every pushed filter is ALSO returned to Spark for residual row
  evaluation — stats skipping is a superset guarantee, so this is
  the "partially pushed" contract, the same split a parquet scan
  uses between row-group pruning and the row-level predicate;
- snapshot isolation & time travel via ``option("version", n)`` —
  the manifest is resolved once at planning, so a concurrent commit
  cannot tear the scan;
- schema evolution: batches are projected to the snapshot's anchor
  schema (old files yield added columns as null), same rule as
  ``TxTable.read``.

Readers emit Arrow record batches straight from the parquet files —
no Python row loop.
"""

from __future__ import annotations

from dataclasses import dataclass

import os

from urllib.parse import quote as _urlquote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

from nfl_data_pipeline_spark.jobs.txlog import TxTable


@dataclass
class _FilePartition(InputPartition):
    path: str


def _anchor_arrow_schema(table: TxTable, version):
    import pyarrow.parquet as pq

    m = table.manifest(version)
    anchor = m.get("schema_file")
    files = m["files"]
    path = anchor if anchor else (files[0]["path"] if files else None)
    if path is None:
        raise ValueError("cannot infer schema of an empty tx table")
    return pq.read_schema(path)


class TxTableDataSource(DataSource):
    """options: path (required), version (int, optional time travel),
    partitionColumn (optional — enables partition-level pruning for
    equality/IN filters on that column)."""

    @classmethod
    def name(cls) -> str:
        return "txtable"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import StructField, StructType

        table = TxTable(self.options["path"])
        v = self.options.get("version")
        inferred = from_arrow_schema(
            _anchor_arrow_schema(table, int(v) if v is not None else None)
        )
        # every field nullable: pre-evolution files surface added
        # columns as null, regardless of the anchor file's own
        # nullability (an anchor written NOT NULL would otherwise NPE
        # the unsafe row writer on old files)
        return StructType(
            [StructField(f.name, f.dataType, True) for f in inferred.fields]
        )

    def reader(self, schema) -> "TxTableReader":
        return TxTableReader(self.options, schema)

    def streamReader(self, schema) -> "TxTableStreamReader":
        return TxTableStreamReader(self.options, schema)

    def writer(self, schema, overwrite: bool) -> "TxTableBatchWriter":
        if overwrite:
            raise NotImplementedError(
                "txtable writes are append-only commits; rewrite via "
                "TxTable.commit(remove_partitions=...) or compaction"
            )
        return TxTableBatchWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> "TxTableStreamWriter":
        return TxTableStreamWriter(self.options)


class TxTableReader(DataSourceReader):
    def __init__(self, options, schema):
        self.root = options["path"]
        v = options.get("version")
        self.version = int(v) if v is not None else None
        self.partition_col = options.get("partitionColumn")
        self.schema = schema
        # pushed-state: {col: (lo, hi)} open intervals, partition set
        self.ranges: dict = {}
        self.partitions_in: set | None = None

    # ---- planning -------------------------------------------------------

    def pushFilters(self, filters):
        """Fold supported comparisons into manifest pruning state.
        EVERY filter is yielded back: stats/partition skipping is a
        superset guarantee, so Spark must still evaluate rows — the
        'partially pushed' contract."""
        for f in filters:
            # Only top-level columns participate in stats/partition
            # pruning: a filter on nested field a.b.c must NOT be
            # treated as one on top-level 'c' (same-named top-level
            # column would prune files by the wrong values and break
            # the superset guarantee).
            col = (
                f.attribute[0]
                if isinstance(f, Filter) and len(f.attribute) == 1
                else None
            )
            if col is None:
                yield f
                continue
            if isinstance(f, EqualTo):
                self._narrow(col, f.value, f.value)
                if col == self.partition_col:
                    self._keep_partitions({str(f.value)})
            elif isinstance(f, In) and col == self.partition_col:
                self._keep_partitions({str(v) for v in f.value})
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                self._narrow(col, f.value, None)
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                self._narrow(col, None, f.value)
            yield f  # residual row-level evaluation stays with Spark

    def _narrow(self, col, lo, hi) -> None:
        old_lo, old_hi = self.ranges.get(col, (None, None))
        if lo is not None:
            old_lo = lo if old_lo is None else max(old_lo, lo)
        if hi is not None:
            old_hi = hi if old_hi is None else min(old_hi, hi)
        self.ranges[col] = (old_lo, old_hi)

    def _keep_partitions(self, vals: set) -> None:
        self.partitions_in = (
            vals
            if self.partitions_in is None
            else self.partitions_in & vals
        )

    def partitions(self):
        files = TxTable(self.root).live_files(
            self.version,
            partitions=self.partitions_in,
            ranges={c: r for c, r in self.ranges.items()} or None,
        )
        return [_FilePartition(f["path"]) for f in files]

    # ---- execution ------------------------------------------------------

    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        want = to_arrow_schema(self.schema)
        pf = pq.ParquetFile(partition.path)
        have = {f.name for f in pf.schema_arrow}
        cols = [f.name for f in want if f.name in have]
        for batch in pf.iter_batches(columns=cols):
            arrays = []
            for field in want:
                if field.name in have:
                    arrays.append(
                        batch.column(cols.index(field.name)).cast(field.type)
                    )
                else:  # pre-evolution file: added column reads null
                    arrays.append(pa.nulls(batch.num_rows, field.type))
            yield pa.RecordBatch.from_arrays(arrays, schema=want)


class TxTableStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("txtable")`` — the table's commit log
    AS a stream: manifest versions are the offsets, each micro-batch
    is the file-level change feed between two snapshots
    (``read_changes`` semantics: exact inserted rows for append-only
    tables, new partition state for rewrite tables).

    Exactly-once falls out of the offset design: versions are
    monotonically increasing integers published atomically, the
    planner records {version} in its own checkpoint, and a replayed
    batch re-reads exactly the same manifest set-difference — no
    dedup state, no timestamps, no listing races. This is the
    streaming twin of the CDC poll loop in
    tests/test_txlog.py::test_cdc_drives_downstream_rollup.

    ``option("startingVersion", n)`` begins after snapshot n (default
    -1 = the full table as the first batch).
    """

    def __init__(self, options, schema):
        self.root = options["path"]
        self.schema = schema
        self.start_version = int(options.get("startingVersion", -1))

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        v = TxTable(self.root).latest_version()
        return {"version": v if v is not None else self.start_version}

    def partitions(self, start: dict, end: dict):
        t = TxTable(self.root)
        old = {f["path"] for f in t.manifest(start["version"])["files"]}
        added = [
            f["path"]
            for f in t.manifest(end["version"])["files"]
            if f["path"] not in old
        ]
        # planner contract: at least one partition per batch; an
        # empty delta (pure-delete commits) becomes zero row batches
        return [_FilePartition(p) for p in added] or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return iter(())
        return TxTableReader.read(self, partition)

    def commit(self, end: dict) -> None:
        pass  # retention is vacuum's job; offsets live in the checkpoint


# --- write path ----------------------------------------------------------


@dataclass
class _StagedFiles(WriterCommitMessage):
    entries: list  # [(path, partition_value)]


class _TxArrowWriterBase:
    """Executor side shared by the batch and streaming writers: each
    task streams its Arrow batches into one parquet file per
    partition value under the table's data/ staging area and reports
    the paths; nothing becomes visible until the DRIVER folds the
    reported entries into one manifest commit. A failed/duplicated
    task's files are unreferenced orphans — vacuum's territory —
    which is exactly the parquet-job commit protocol, done at
    manifest level."""

    def __init__(self, options):
        self.root = options["path"]
        self.partition_col = options.get("partitionColumn")

    def write(self, iterator) -> _StagedFiles:
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        stage = os.path.join(self.root, "data", f"stage-{_uuid.uuid4().hex}")
        os.makedirs(stage, exist_ok=True)
        writers: dict = {}
        try:
            for batch in iterator:
                if self.partition_col is None:
                    groups = {"all": batch}
                else:
                    tbl = pa.Table.from_batches([batch])
                    col = tbl.column(self.partition_col)
                    groups = {}
                    import pyarrow.compute as pc

                    for pv in pc.unique(col).to_pylist():
                        if pv is None:
                            # mirror TxTable.stage_files: manifests key
                            # partitions by str(value), which cannot
                            # round-trip null
                            raise ValueError(
                                "null partition values are not "
                                "supported by txtable writes"
                            )
                        groups[str(pv)] = tbl.filter(
                            pc.equal(col, pv)
                        )
                for pv, data in groups.items():
                    w = writers.get(pv)
                    if w is None:
                        # percent-escape the value for the filename —
                        # raw pv may contain '/' or other path-hostile
                        # chars; the manifest stores the RAW value
                        safe = _urlquote(pv, safe="")
                        path = os.path.join(stage, f"{safe}-{_uuid.uuid4().hex}.parquet")
                        w = (pq.ParquetWriter(path, data.schema), path)
                        writers[pv] = w
                    w[0].write(data)
        finally:
            for w, _ in writers.values():
                w.close()
        return _StagedFiles(
            entries=[(path, pv) for pv, (_, path) in writers.items()]
        )

    def abort_cleanup(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            for path, _ in m.entries:
                try:
                    os.unlink(path)
                except OSError:
                    pass

    def entries_of(self, messages, stats_cols=None) -> list:
        from nfl_data_pipeline_spark.jobs.txlog import (
            _footer_rows,
            _footer_stats,
        )

        entries = []
        for m in messages:
            if m is None:
                continue
            for path, pv in m.entries:
                e = {
                    "path": path,
                    "partition": pv,
                    "bytes": os.path.getsize(path),
                    "rows": _footer_rows(path),
                }
                if stats_cols:
                    e["stats"] = _footer_stats(path, stats_cols)
                entries.append(e)
        return entries


def _commit_with_retry(t: TxTable, entries: list, bid) -> None:
    """Append commits don't depend on the base snapshot (no removes),
    so losing an optimistic-concurrency race to another writer is
    always retryable: re-resolve head, re-check the replay marker,
    publish again."""
    from nfl_data_pipeline_spark.jobs.txlog import CommitConflict

    for _ in range(5):
        if bid is not None and t.is_applied(bid):
            return
        try:
            t.commit(entries, batch_id=bid)
            return
        except CommitConflict:
            continue
    raise CommitConflict(
        f"append of batch {bid!r} lost 5 straight commit races"
    )


class TxTableBatchWriter(_TxArrowWriterBase, DataSourceArrowWriter):
    """``df.write.format("txtable")`` append: one atomic manifest
    commit per save; ``option("batchId", id)`` makes the save
    idempotent (a replayed id is a detected no-op)."""

    def __init__(self, options):
        super().__init__(options)
        self.batch_id = options.get("batchId")
        self.stats_cols = (
            options["statsColumns"].split(",")
            if "statsColumns" in options
            else None
        )

    def commit(self, messages) -> None:
        t = TxTable(self.root)
        if self.batch_id is not None and t.is_applied(self.batch_id):
            self.abort_cleanup(messages)
            return
        _commit_with_retry(
            t, self.entries_of(messages, self.stats_cols), self.batch_id
        )

    def abort(self, messages) -> None:
        self.abort_cleanup(messages)


class TxTableStreamWriter(_TxArrowWriterBase, DataSourceStreamArrowWriter):
    """``writeStream.format("txtable")`` — exactly-once streaming
    sink with NO foreachBatch plumbing: the engine's micro-batch id
    becomes the manifest batch id in the same atomic swap as the
    data, so a replayed epoch is detected and skipped. This is the
    sink-side half of the contract the funnel builds by hand.

    ``option("sinkId", name)`` namespaces the epoch markers — REQUIRED
    when more than one streaming query appends into the same table
    (two unnamed queries both at epoch N would otherwise read each
    other's marker as their own replay and drop data)."""

    def __init__(self, options):
        super().__init__(options)
        self.sink_id = options.get("sinkId", "")
        self.stats_cols = (
            options["statsColumns"].split(",")
            if "statsColumns" in options
            else None
        )

    def _bid(self, batchId: int) -> str:
        return f"epoch-{self.sink_id}-{batchId}" if self.sink_id else f"epoch-{batchId}"

    def commit(self, messages, batchId: int) -> None:
        t = TxTable(self.root)
        bid = self._bid(batchId)
        if t.is_applied(bid):
            self.abort_cleanup(messages)  # replayed epoch → no-op
            return
        _commit_with_retry(
            t, self.entries_of(messages, self.stats_cols), bid
        )

    def abort(self, messages, batchId: int) -> None:
        self.abort_cleanup(messages)


# Per-bucket broadcast cap in MANIFEST (compressed parquet) bytes:
# 256 MB of files hydrates to roughly 0.5-1.5 GB of hash relation —
# comfortably inside executor memory, an order of magnitude under the
# 8 GB abort line.
_BUCKET_BROADCAST_MAX_BYTES = 256 * 1024 * 1024


def bucketed_tx_join(
    spark,
    ta: TxTable,
    tb: TxTable,
    on: list[str],
    how: str = "inner",
    version_a: int | None = None,
    version_b: int | None = None,
    project_a: list[str] | None = None,
    project_b: list[str] | None = None,
    layout_meta: str | None = None,
):
    """Partition-wise join of two CO-BUCKETED tx tables with NO
    shuffle — the Spark-side answer to "partition-values hints", which
    the Python DataSource API cannot express (no
    SupportsReportPartitioning for Python sources, so Catalyst always
    assumes an unknown distribution and plans an exchange; re-checked
    pyspark 4.1.2 — DataSourceReader still exposes only
    partitions/pushFilters/read, so this stays the permanent
    boundary, not a carried TODO).

    Contract: both tables are partitioned by the same deterministic
    bucketing of the join key (e.g. ``pmod(xxhash64(k), N)``), so
    matching rows can only meet inside the same bucket. The plan is a
    UNION of per-bucket joins, each scanning only that bucket's files
    (manifest pruning); the smaller side PER BUCKET — chosen from
    manifest byte counts, no sampling — is broadcast, so the executed
    plan contains no hashpartitioning exchange at all (asserted in
    tests/test_txsource.py).

    ``how`` is inner/left_semi/left_anti/left: bucket-local joins are
    complete for any join type where a LEFT row's matches live only in
    its own bucket — which is every equality join over the bucketing
    key. ``left`` (outer) handles an A bucket with no B counterpart by
    null-extending A's rows with B's non-key columns (typed from B's
    schema), exactly what the per-bucket left join would produce
    against an empty B slice. Returns None when either side is empty.

    ``layout_meta``: name of a meta key whose value pins the partition
    LAYOUT (e.g. jobs/forget's range-layout stamp ``{col, id_col, lo,
    width}``, or a gate's ``gate_config``). When given, both tables
    must carry EQUAL values — two tables partitioned under different
    bucket arithmetic would silently drop matching rows (the same
    failure class as the media-gate probe/layout drift), so the
    mismatch raises before any work. The forget range-cluster layout
    (``delete_by_key_tx``) makes range-co-partitioned pairs common;
    a pair sharing (id_col, lo, width) joins partition-wise here with
    no exchange.

    At 100 TB: per-bucket scans parallelize across executors, the
    broadcast bound is per-bucket (pick the bucket count so the
    smaller table's buckets stay under the broadcast threshold), and
    no 100-TB shuffle ever materializes — the same reason warehouses
    bucket their biggest fact tables.
    """
    from pyspark.sql import functions as F

    if how not in ("inner", "left_semi", "left_anti", "left"):
        raise ValueError(
            f"bucket-local {how!r} join is not complete: unmatched "
            "buckets on the other side would be silently dropped"
        )
    if layout_meta is not None:
        la = ta.meta(version_a).get(layout_meta)
        lb = tb.meta(version_b).get(layout_meta)
        if la is None or lb is None:
            # None == None must NOT pass: an unstamped table proves
            # nothing about its layout, and silently skipping the
            # check is exactly the failure the parameter guards
            raise ValueError(
                f"co-partition layout meta {layout_meta!r} missing on "
                f"{'both tables' if la is lb else ('left' if la is None else 'right') + ' table'}"
                " — stamp the layout or drop layout_meta to skip the guard"
            )
        if la != lb:
            raise ValueError(
                f"co-partition layout mismatch on meta {layout_meta!r}: "
                f"{la} != {lb} — differently-bucketed tables would "
                "silently drop matching rows"
            )
    bytes_a: dict = {}
    bytes_b: dict = {}
    for f in ta.live_files(version_a):
        bytes_a[f["partition"]] = bytes_a.get(f["partition"], 0) + f["bytes"]
    for f in tb.live_files(version_b):
        bytes_b[f["partition"]] = bytes_b.get(f["partition"], 0) + f["bytes"]
    buckets = sorted(
        set(bytes_a) & set(bytes_b)
        if how == "inner"
        else set(bytes_a)  # semi/anti/left keep every left bucket
    )
    # for the outer form, the null-extension columns come from B's
    # real schema: any live bucket serves, falling back to the
    # manifest's schema anchor for an entirely-empty B (so a left
    # enrichment against a not-yet-populated table still returns A
    # null-extended instead of None — matching what left_anti does)
    b_fields = None
    if how == "left":
        sample_b = None
        if bytes_b:
            sample_b = tb.read(
                spark, version=version_b, partitions={next(iter(bytes_b))}
            )
        if sample_b is None:
            anchor = tb.manifest(version_b).get("schema_file")
            if anchor and os.path.exists(anchor):
                sample_b = spark.read.parquet(anchor).limit(0)
        if sample_b is not None:
            if project_b:
                sample_b = sample_b.select(*project_b)
            b_fields = [f for f in sample_b.schema.fields if f.name not in on]
        elif not bytes_b:
            raise ValueError(
                "bucket-local left join: B is empty with no schema "
                "anchor, so A's rows cannot be null-extended with "
                "typed B columns — returning None here would silently "
                "drop every A row"
            )
    out = None
    for p in buckets:
        da = ta.read(spark, version=version_a, partitions={p})
        if da is None:
            continue
        if project_a:
            da = da.select(*project_a)
        db = tb.read(spark, version=version_b, partitions={p})
        if db is not None and project_b:
            db = db.select(*project_b)
        if db is None:
            if how == "left_anti":
                j = da
            elif how == "left" and b_fields is not None:
                # an empty B slice: the per-bucket left join degenerates
                # to A's rows null-extended with B's non-key columns
                j = da.select(
                    "*",
                    *[
                        F.lit(None).cast(f.dataType).alias(f.name)
                        for f in b_fields
                    ],
                )
            else:
                continue
        elif how != "inner" or bytes_b.get(p, 0) <= bytes_a.get(p, 0):
            # semi/anti/left must keep the left side un-broadcast.
            # Byte-gated from the MANIFEST (no extra pass): "smaller
            # side per bucket" is relative — a bucket of a 100-TB
            # table can have both sides past the 8 GB broadcast abort
            # line, where the right plan is a plain per-bucket join
            # (rows are already co-located by the shared bucketing,
            # so the exchange it falls back to is bucket-local sized)
            j = da.join(
                F.broadcast(db)
                if bytes_b.get(p, 0) <= _BUCKET_BROADCAST_MAX_BYTES
                else db,
                on,
                how,
            )
        else:
            da_h = (
                F.broadcast(da)
                if bytes_a.get(p, 0) <= _BUCKET_BROADCAST_MAX_BYTES
                else da
            )
            j = da_h.join(db, on, how)
        out = j if out is None else out.unionByName(j)
    return out
