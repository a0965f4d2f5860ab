"""WARC (Web ARChive, ISO 28500) batch source via the PySpark 4 Python
Data Source API.

Web crawls — the dominant raw input of LLM training corpora — ship as
WARC: a sequence of records, each a ``WARC/1.0`` version line, CRLF
header block, ``Content-Length``-delimited payload, and a blank-line
separator.  Spark has no native WARC reader, and the usual workaround
(wholetext + regex) materializes whole files on one executor.  This
module registers a ``warc`` format instead::

    spark.dataSource.register(WarcDataSource)
    df = spark.read.format("warc").load("/crawl/segments/*.warc.gz")

Scale posture:

- **One input partition per file** (the WARC convention is many ~1 GB
  segment files), so a 1000-executor cluster reads 1000 segments
  concurrently; records stream through a generator — no file is ever
  materialized whole.
- **Payload is an opaque ``binary`` column** with typed metadata
  alongside, the same contract as ``operators/multimodal.py`` — decode
  happens downstream in Arrow-batched ``mapInPandas`` stages, not in the
  reader.
- Gzip (.gz) is handled transparently; multi-member gzip (the
  record-per-member layout CommonCrawl uses) works because Python's
  ``gzip`` streams across members.

The format is public (ISO 28500 / IIPC warc-specifications); the parser
below implements the subset every crawler emits: version line, folded
headers, Content-Length framing, CRLF record separators.
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
import os
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("record_id", StringType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_type", StringType()),
        StructField("content_length", LongType()),
        StructField("payload", BinaryType()),
        StructField("source_file", StringType()),
    ]
)


def _open(path: str) -> io.BufferedReader:
    if path.endswith(".gz"):
        return gzip.open(path, "rb")  # streams across gzip members
    return open(path, "rb")


def parse_warc(stream: io.BufferedReader) -> Iterator[dict]:
    """Yield one dict per WARC record.  Tolerates leading blank lines,
    folded (continuation) headers, and both CRLF and LF line endings —
    the spec mandates CRLF but real crawl data is mixed."""
    while True:
        # seek the version line
        line = stream.readline()
        if not line:
            return
        if not line.strip():
            continue
        if not line.strip().startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line, got {line[:40]!r}")
        headers: dict[str, str] = {}
        last_key = None
        while True:
            raw = stream.readline()
            if not raw or not raw.strip():
                break
            text = raw.decode("utf-8", errors="replace").rstrip("\r\n")
            if text[:1] in (" ", "\t") and last_key:  # folded continuation
                headers[last_key] += " " + text.strip()
                continue
            key, _, value = text.partition(":")
            last_key = key.strip().lower()
            headers[last_key] = value.strip()
        length = int(headers.get("content-length", "0"))
        payload = stream.read(length)
        if len(payload) != length:
            raise ValueError(
                f"truncated record {headers.get('warc-record-id')}: "
                f"wanted {length} bytes, got {len(payload)}"
            )
        yield {
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": length,
            "payload": payload,
        }


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("warc source requires a path")
        paths = sorted(_glob.glob(path)) if _glob.has_magic(path) else None
        if paths is None:
            paths = (
                sorted(
                    os.path.join(path, f)
                    for f in os.listdir(path)
                    if f.endswith((".warc", ".warc.gz"))
                )
                if os.path.isdir(path)
                else [path]
            )
        if not paths:
            raise ValueError(f"no WARC files under {path}")
        self.paths = paths
        self.types = {
            t.strip()
            for t in options.get("record_types", "").split(",")
            if t.strip()
        }

    def partitions(self):
        # one partition per segment file: the unit of parallelism crawls
        # are already sharded by, and the unit a task can stream alone.
        return [_WarcFilePartition(p) for p in self.paths]

    def read(self, partition: _WarcFilePartition):
        with _open(partition.path) as stream:
            for rec in parse_warc(stream):
                # record-type pushdown (option("record_types", "response"))
                # happens here in the reader, before rows reach Spark.
                if self.types and rec["warc_type"] not in self.types:
                    continue
                yield (
                    rec["record_id"],
                    rec["warc_type"],
                    rec["target_uri"],
                    rec["warc_date"],
                    rec["content_type"],
                    rec["content_length"],
                    rec["payload"],
                    partition.path,
                )


class WarcDataSource(DataSource):
    """``spark.read.format("warc")`` (batch) or
    ``spark.readStream.format("warc")`` (micro-batch directory tail)
    after registration.

    Options: ``path`` (file, glob, or directory; the stream reader
    requires a directory), ``record_types`` (comma-separated WARC-Type
    filter applied inside the reader).
    """

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> StructType:
        return WARC_SCHEMA

    def reader(self, schema: StructType) -> WarcReader:
        return WarcReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> "WarcStreamReader":
        return WarcStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "WarcWriter":
        return WarcWriter(self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> "WarcStreamWriter":
        return WarcStreamWriter(self.options)


def _emit_records(out, records: list[dict]) -> None:
    for rec in records:
        payload: bytes = rec["payload"]
        head = [
            "WARC/1.0",
            f"WARC-Record-ID: {rec['record_id']}",
            f"WARC-Type: {rec['warc_type']}",
            f"Content-Length: {len(payload)}",
        ]
        for opt, key in (
            ("target_uri", "WARC-Target-URI"),
            ("warc_date", "WARC-Date"),
            ("content_type", "Content-Type"),
        ):
            if rec.get(opt):
                head.append(f"{key}: {rec[opt]}")
        out.write("\r\n".join(head).encode() + b"\r\n\r\n")
        out.write(payload)
        out.write(b"\r\n\r\n")


def write_warc(path: str, records: list[dict], *, compress: bool | None = None) -> None:
    """Minimal spec-conformant WARC writer (fixtures + round-trip tests;
    gzip if the path ends in .gz unless ``compress`` overrides).  Each
    record dict needs ``record_id``, ``warc_type``, ``payload`` (bytes)
    and may carry ``target_uri``, ``warc_date``, ``content_type``."""
    if compress is None:
        compress = path.endswith(".gz")
    opener = gzip.open if compress else open
    with opener(path, "wb") as out:
        _emit_records(out, records)


# ---------------------------------------------------------------------------
# Streaming: tail a crawl segment-drop directory.
# ---------------------------------------------------------------------------


class WarcStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader: each batch ingests the WARC segment files that
    appeared in the directory since the last offset.

    The offset is the sorted list of file names already ingested — small
    for the session-scale drops this targets, replayable exactly
    (``readBetweenOffsets`` re-reads precisely the files in ``end`` minus
    ``start``, so a restarted query reproduces the same batch).  A
    production-scale variant would compact the offset to a high-water
    mark over (mtime, name); the exactly-once contract stays the same.

    Producer protocol: drops MUST be atomic — write to a temporary name,
    then rename into the directory (exactly what this module's own
    writers do with ``.inprogress`` names).  A segment still being
    written in place would either fail the batch mid-parse or, worse,
    parse cleanly mid-write and have its tail records permanently missed
    once the name enters the offset.  As a guard against non-atomic
    producers, ``read`` stats every candidate before AND after parsing
    and defers any file whose size/mtime changed during the batch to a
    later trigger instead of committing it to the offset.
    """

    def __init__(self, options: dict):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("warc stream source requires a directory path")
        self.types = {
            t.strip()
            for t in options.get("record_types", "").split(",")
            if t.strip()
        }

    def _list(self) -> list[str]:
        return sorted(
            f
            for f in os.listdir(self.dir)
            if f.endswith((".warc", ".warc.gz"))
        )

    def initialOffset(self) -> dict:
        return {"files": []}

    def _rows_for(self, names: list[str]):
        for name in names:
            path = os.path.join(self.dir, name)
            with _open(path) as stream:
                for rec in parse_warc(stream):
                    if self.types and rec["warc_type"] not in self.types:
                        continue
                    yield (
                        rec["record_id"],
                        rec["warc_type"],
                        rec["target_uri"],
                        rec["warc_date"],
                        rec["content_type"],
                        rec["content_length"],
                        rec["payload"],
                        path,
                    )

    def read(self, start: dict):
        # The Simple stream API prefetches on the driver and keeps the
        # returned iterator in its offset cache via copy.copy + next(), so
        # it must be a COPYABLE iterator — a materialized list's iterator,
        # not a generator.  That driver-side batch is the documented
        # trade-off of SimpleDataSourceStreamReader (meant for modest
        # per-trigger volume like segment drops); a partition-parallel
        # DataSourceStreamReader is the step up if drops outgrow the
        # driver.
        seen = set(start.get("files", []))
        new = [f for f in self._list() if f not in seen]

        def _stat(name: str):
            try:
                st = os.stat(os.path.join(self.dir, name))
                return (st.st_size, st.st_mtime_ns)
            except OSError:
                return None

        # Parse file-by-file, stat'ing before and after: a file a
        # non-atomic producer touched while we parsed (stat changed, or a
        # truncated-record parse error WITH a changed stat) is deferred —
        # its rows are dropped from this batch and its name stays out of
        # the offset, so the next trigger re-reads the settled file.  A
        # parse error on a stable file is genuine corruption and still
        # fails the batch.
        rows: list = []
        stable: list[str] = []
        for f in new:
            before = _stat(f)
            if before is None:
                continue  # vanished between listing and stat: not ours yet
            try:
                file_rows = list(self._rows_for([f]))
            except ValueError:
                if _stat(f) != before:
                    continue  # mid-write truncation: defer
                raise
            if _stat(f) != before:
                continue
            rows.extend(file_rows)
            stable.append(f)
        return iter(rows), {"files": sorted(seen | set(stable))}

    def readBetweenOffsets(self, start: dict, end: dict):
        seen = set(start.get("files", []))
        replay = [f for f in end.get("files", []) if f not in seen]
        return iter(list(self._rows_for(replay)))


# ---------------------------------------------------------------------------
# Writing: re-shard / export a corpus back to WARC segments.
# ---------------------------------------------------------------------------


@dataclass
class _WarcSegmentCommit(WriterCommitMessage):
    path: str
    records: int
    partition: int = -1


class WarcWriter(DataSourceWriter):
    """``df.write.format("warc").mode("append").save(dir)``: one segment
    file per input partition (so the write parallelism IS the sharding),
    gzip by default (``option("compression", "none")`` opts out).  Tasks
    write to ``.inprogress`` names and ``commit`` renames them — an
    aborted/speculated task never leaves a readable segment behind,
    which is what makes the job-level all-or-nothing contract hold on a
    plain filesystem.  NB: Spark's Python data source framework only
    permits Append/Overwrite save modes (the default ErrorIfExists is
    rejected before ``writer()`` is called)."""

    def __init__(self, options: dict, overwrite: bool):
        import uuid

        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("warc writer requires a directory path")
        self.compress = options.get("compression", "gzip") != "none"
        # Per-JOB id generated once on the driver and serialized to every
        # task, exactly as Spark's built-in file writers embed a job UUID:
        # taskAttemptId alone is only unique within one SparkContext, so
        # append-mode writes from a LATER application could reproduce the
        # same part-<pid>-<attempt> name and silently overwrite previously
        # committed segments.
        self.job_id = uuid.uuid4().hex[:12]
        os.makedirs(self.dir, exist_ok=True)
        if overwrite:
            for f in os.listdir(self.dir):
                if f.endswith((".warc", ".warc.gz", ".inprogress")):
                    os.remove(os.path.join(self.dir, f))

    def write(self, rows) -> _WarcSegmentCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        suffix = ".warc.gz" if self.compress else ".warc"
        # job UUID makes the name globally unique; taskAttemptId still
        # separates concurrent speculative attempts within the job.
        final = os.path.join(
            self.dir,
            f"part-{ctx.partitionId():05d}-{self.job_id}-"
            f"{ctx.taskAttemptId()}{suffix}",
        )
        tmp = final + ".inprogress"
        records = [
            {
                "record_id": row["record_id"],
                "warc_type": row["warc_type"],
                "target_uri": row["target_uri"],
                "warc_date": row["warc_date"],
                "content_type": row["content_type"],
                "payload": bytes(row["payload"]),
            }
            for row in rows
        ]
        # the .inprogress tmp name hides the final suffix, so compression
        # is decided explicitly rather than by suffix sniffing
        write_warc(tmp, records, compress=self.compress)
        return _WarcSegmentCommit(path=tmp, records=len(records))

    def commit(self, messages) -> None:
        for m in messages:
            os.rename(m.path, m.path[: -len(".inprogress")])

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class WarcStreamWriter(DataSourceStreamWriter):
    """``writeStream.format("warc")``: every micro-batch lands as one
    segment per task, named ``batch-{epoch}-part-{partition}`` so a
    REPLAYED epoch (failure recovery) rewrites the same file names —
    idempotent at the segment level, the property exactly-once sinks on
    plain filesystems are built from.  Tasks write uniquely-named
    ``.inprogress`` files; the EPOCH naming happens in
    ``commit(messages, batchId)``, which is handed the authoritative
    batch id by the micro-batch engine — tasks never have to guess it
    from a local property (the old ``streaming.sql.batchId`` lookup fell
    back to a constant when the property was absent, which made every
    epoch on that path clobber the previous one).  A crashed epoch never
    leaves a readable segment; a replayed one atomically replaces its
    own files."""

    def __init__(self, options: dict):
        import uuid

        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("warc stream writer requires a directory path")
        self.compress = options.get("compression", "gzip") != "none"
        self.job_id = uuid.uuid4().hex[:12]  # keeps tmp names globally unique
        os.makedirs(self.dir, exist_ok=True)

    def write(self, rows) -> _WarcSegmentCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        tmp = os.path.join(
            self.dir,
            f"part-{pid:05d}-{self.job_id}-{ctx.taskAttemptId()}.inprogress",
        )
        records = [
            {
                "record_id": row["record_id"],
                "warc_type": row["warc_type"],
                "target_uri": row["target_uri"],
                "warc_date": row["warc_date"],
                "content_type": row["content_type"],
                "payload": bytes(row["payload"]),
            }
            for row in rows
        ]
        write_warc(tmp, records, compress=self.compress)
        return _WarcSegmentCommit(path=tmp, records=len(records), partition=pid)

    def commit(self, messages, batchId: int) -> None:
        suffix = ".warc.gz" if self.compress else ".warc"
        for m in messages:
            if m is not None and os.path.exists(m.path):
                final = os.path.join(
                    self.dir, f"batch-{batchId}-part-{m.partition:05d}{suffix}"
                )
                os.rename(m.path, final)  # replace = replayed-epoch idempotence

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
