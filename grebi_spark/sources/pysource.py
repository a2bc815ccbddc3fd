"""Custom Python DataSource (Spark 4 DataSource API): the GrEBI JSONL
entity interchange format as a first-class pluggable source AND sink.

The reference's stages talk newline-delimited JSON entities over pipes
(03_merge/grebi_merge/src/main.rs:88-150, nextflow/01_create_subgraph.nf:
108-114). Spark reads JSONL natively, but the point here is the *plugin
surface*: Spark 4's Python DataSource API lets an engine ship its own
formats without JVM code — `spark.dataSource.register(...)` then
`spark.read.format("grebi_jsonl")` / `df.write.format("grebi_jsonl")`.

Scale shape: the reader plans ONE InputPartition PER FILE (driver lists
the directory; executors each open only their file — the same
split-by-file parallelism the reference's per-file ingest jobs use,
nextflow/01_create_subgraph.nf:86-116). The writer runs per-partition on
executors, emitting one shard per task with the partition id in the file
name (deterministic, collision-free), and reports rows written through
WriterCommitMessage so the driver can log the commit. Python-source rows
cross to the JVM via Arrow batches. For a 100 TB directory the file
listing is the only driver-side work; everything else is per-executor
streaming IO.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass
class _FilePartition(InputPartition):
    path: str


@dataclass
class _WriteResult(WriterCommitMessage):
    rows: int
    path: str


class GrebiJsonlReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self._schema = schema
        self._path = options.get("path")
        if not self._path:
            raise ValueError("grebi_jsonl requires a path")

    def partitions(self):
        files = sorted(
            os.path.join(self._path, f)
            for f in os.listdir(self._path)
            if f.endswith(".jsonl")
        )
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        # yield Arrow RecordBatches, not per-row tuples: the batch form
        # crosses the Python→JVM boundary as one Arrow buffer per chunk
        # (~10× less serialization than row-at-a-time pickling)
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self._schema)
        fields = [f.name for f in self._schema.fields]
        # a `__file` schema field is filled with the source file's name
        # (the input_file_name() analogue) — verb-dispatching consumers
        # (mixed-verb maintenance streams) key on it
        fname = os.path.basename(partition.path)
        rows: list[dict] = []

        def _cell(r: dict, f: str):
            return fname if f == "__file" else r.get(f)

        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
                if len(rows) >= 10_000:
                    yield pa.RecordBatch.from_pylist(
                        [{f: _cell(r, f) for f in fields} for r in rows],
                        schema=arrow_schema,
                    )
                    rows = []
        if rows:
            yield pa.RecordBatch.from_pylist(
                [{f: _cell(r, f) for f in fields} for r in rows],
                schema=arrow_schema,
            )


class GrebiJsonlWriter(DataSourceArrowWriter):
    """Arrow-batched writer: each task receives pyarrow RecordBatches
    (one Arrow buffer per chunk instead of row-at-a-time pickling) and
    streams them out as JSON lines via ``to_pylist``.

    Commit protocol (the standard temp-file/rename pattern): each task
    writes to ``part-NNNNN.jsonl.tmp-<attempt>`` — a task that dies
    mid-write leaves only a tmp file that no reader matches — and the
    driver-side ``commit`` renames exactly the shards named in the
    WriterCommitMessages to their final ``part-NNNNN.jsonl`` names
    (append mode: ``part-NNNNN-<writeid>.jsonl``, so a second append
    with overlapping partition ids adds shards instead of replacing the
    first write's).
    ``mode("overwrite")`` deletes the target's pre-existing ``*.jsonl``
    at commit time, so a previous write with MORE partitions can't leave
    stale shards that later reads silently include. ``abort`` removes
    the tmp files. Rename/cleanup run on the driver, so the target must
    be a filesystem the driver shares with executors (local mode, NFS,
    fuse-mounted object store) — the same constraint the reference's
    pipe-to-directory stages have."""

    def __init__(self, options: dict, overwrite: bool) -> None:
        self._path = options.get("path")
        self._overwrite = overwrite
        if not self._path:
            raise ValueError("grebi_jsonl requires a path")
        # append-mode shard names carry a per-write token: two append
        # writes with overlapping partition ids must ADD shards, not
        # silently os.replace() the earlier write's part-NNNNN.jsonl.
        # Overwrite mode keeps the bare deterministic names (it deletes
        # all prior *.jsonl at commit, so collisions cannot happen).
        import uuid

        self._wid = "" if overwrite else f"-{uuid.uuid4().hex[:8]}"

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        os.makedirs(self._path, exist_ok=True)
        tmp = os.path.join(
            self._path,
            f"part-{pid:05d}{self._wid}.jsonl.tmp-{ctx.taskAttemptId()}",
        )
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for batch in iterator:
                for obj in batch.to_pylist():
                    fh.write(json.dumps(obj, sort_keys=True) + "\n")
                    n += 1
        return _WriteResult(rows=n, path=tmp)

    def commit(self, messages):
        if self._overwrite:
            for f in os.listdir(self._path):
                if f.endswith(".jsonl"):
                    os.remove(os.path.join(self._path, f))
        committed = set()
        for m in messages:
            if m is None:
                continue
            final = m.path.rsplit(".tmp-", 1)[0]
            os.replace(m.path, final)
            committed.add(os.path.basename(m.path))
        # leftovers from failed/speculative attempts whose message the
        # engine discarded
        for f in os.listdir(self._path):
            if ".jsonl.tmp-" in f and f not in committed:
                os.remove(os.path.join(self._path, f))

    def abort(self, messages):
        # a failed task's entry is None (DataSourceWriter contract)
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class GrebiJsonlStreamReader:
    """Streaming half of the plugin (SimpleDataSourceStreamReader
    contract): the offset is the SET of file names already consumed
    (JSON-serialized sorted), so each micro-batch ingests exactly the
    files that appeared since the last one — the file-tailing source
    shape (the reference's ingest watches a directory of datasource
    dumps the same way, one job per new file,
    nextflow/01_create_subgraph.nf:86-116). A name set (not an index
    into the sorted listing) makes the contract independent of arrival
    order: a file that sorts BEFORE already-consumed names is still
    ingested exactly once, and consumed files are never re-read.
    Exactly-once: offsets are committed by the engine after the batch
    is durable; ``readBetweenOffsets`` replays the exact name delta
    end − start without consulting the (possibly changed) live listing.
    OFFSET RETENTION: the consumed-name set would otherwise grow with
    the directory forever, so each ``read`` drops names that no longer
    appear in the live listing — a consumed file that was archived or
    deleted can never be re-consumed, so remembering it buys nothing.
    With ``cleanSource=archive`` (or ``delete``) the source itself
    retires consumed files at COMMIT time (the engine's durability
    point), moving them into ``<path>/_archive/`` — Spark's own
    FileStreamSource cleanSource semantics — which keeps BOTH the
    offset and the directory listing bounded by the in-flight file
    count under continuous arrival. ``archive`` keeps crash-replay
    intact (``readBetweenOffsets`` falls back to the archive dir);
    ``delete`` trades replayability for space, exactly like Spark's.
    A retired name that REAPPEARS in the directory is new data and is
    ingested again (same contract as FileStreamSource after cleanup) —
    detected by archive-presence, so name reuse requires ``archive``
    mode (under ``delete`` a reappearing consumed name is
    indistinguishable from a not-yet-cleaned file and is skipped), and
    crash-replay fidelity for a REUSED name is limited to its latest
    content (the re-archive overwrites the prior copy) — producers that
    need byte-exact replay should use unique dump names.
    """

    _ARCHIVE_DIR = "_archive"

    def __init__(self, schema: StructType, options: dict) -> None:
        self._schema = schema
        self._path = options.get("path")
        # legacyOffsetPolicy: how to resume from a checkpoint written by
        # the pre-name-set version ({"n_files": N}). "error" (default)
        # rejects ambiguous offsets; "first_n" opts into the best-effort
        # count→first-N-sorted-names mapping (see _offset_files).
        self._legacy_policy = options.get("legacyOffsetPolicy", "error")
        self._clean = options.get("cleanSource", "off")
        if self._clean not in ("off", "archive", "delete"):
            raise ValueError(
                f"cleanSource must be off/archive/delete, got {self._clean!r}"
            )
        if not self._path:
            raise ValueError("grebi_jsonl requires a path")

    def _names(self) -> list[str]:
        return sorted(f for f in os.listdir(self._path) if f.endswith(".jsonl"))

    def _read_names(self, names) -> list[tuple]:
        fields = [f.name for f in self._schema.fields]
        rows: list[tuple] = []
        for name in sorted(names):
            p = os.path.join(self._path, name)
            if not os.path.exists(p):
                # crash-replay after cleanSource=archive retired the file
                p = os.path.join(self._path, self._ARCHIVE_DIR, name)
            with open(p, encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        obj = json.loads(line)
                        rows.append(
                            tuple(
                                name if f == "__file" else obj.get(f)
                                for f in fields
                            )
                        )
        return rows

    def initialOffset(self) -> dict:
        return {"files": []}

    def _offset_files(self, offset: dict) -> set[str]:
        """Offset → consumed-name set, handling the LEGACY format too:
        checkpoints written by the previous version stored
        ``{"n_files": N}`` (a count into the sorted listing AT CHECKPOINT
        TIME). N = 0 migrates exactly (the empty set). N > 0 is
        genuinely ambiguous: a file that arrived after the checkpoint
        and sorts early (append-mode shard names carry uuids, so this is
        routine) would be silently marked consumed-but-never-read by a
        count→first-N mapping, while a late-sorting consumed file would
        be re-read. Default policy is therefore a clear error telling
        the operator to either restart the checkpoint or opt into the
        best-effort mapping with ``legacyOffsetPolicy=first_n`` (safe
        exactly when no file was added since the legacy checkpoint)."""
        if "files" in offset:
            return set(offset["files"])
        if "n_files" in offset:
            n = offset["n_files"]
            if n == 0:
                return set()
            if self._legacy_policy == "first_n":
                return set(self._names()[:n])
            raise ValueError(
                "grebi_jsonl checkpoint holds a legacy {'n_files': %d} "
                "offset; the consumed-file SET it abbreviates cannot be "
                "reconstructed if the directory changed since. Restart "
                "with a fresh checkpoint location, or — if no file was "
                "added to %r since that checkpoint — resume with "
                ".option('legacyOffsetPolicy', 'first_n')." % (n, self._path)
            )
        raise ValueError(f"unrecognized grebi_jsonl stream offset: {offset!r}")

    def read(self, start: dict):
        seen = self._offset_files(start)
        listing = self._names()
        if self._clean == "archive":
            # a consumed name visible in BOTH the listing and the
            # archive was re-landed after retirement: new data, ingest
            # it (delete mode cannot distinguish a re-land from a
            # not-yet-cleaned file — name reuse needs archive mode)
            arch = os.path.join(self._path, self._ARCHIVE_DIR)
            seen -= {
                n
                for n in listing
                if n in seen and os.path.exists(os.path.join(arch, n))
            }
        fresh = [n for n in listing if n not in seen]
        # retention: remember only names still visible in the directory
        # (plus this batch's); retired files can never be re-consumed
        kept = (seen & set(listing)) | set(fresh)
        return iter(self._read_names(fresh)), {"files": sorted(kept)}

    def readBetweenOffsets(self, start: dict, end: dict):
        delta = sorted(self._offset_files(end) - self._offset_files(start))
        return iter(self._read_names(delta))

    def commit(self, end: dict) -> None:
        """Batch ≤ end is durable: under cleanSource, retire every
        consumed file still sitting in the watched directory."""
        if self._clean == "off":
            return
        arch = os.path.join(self._path, self._ARCHIVE_DIR)
        for name in self._offset_files(end):
            p = os.path.join(self._path, name)
            if not os.path.exists(p):
                continue
            if self._clean == "archive":
                os.makedirs(arch, exist_ok=True)
                os.replace(p, os.path.join(arch, name))
            else:
                os.remove(p)


class GrebiJsonlDataSource(DataSource):
    """format name: ``grebi_jsonl``. Schema must be supplied by the
    caller on read (open-schema JSONL has no self-description — the
    reference solves this the same way, with the summary.json prop
    universe driving downstream readers)."""

    @classmethod
    def name(cls) -> str:
        return "grebi_jsonl"

    def schema(self):
        # default shape: the documents table (the main corpus artifact)
        return (
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint"
        )

    def reader(self, schema: StructType) -> GrebiJsonlReader:
        return GrebiJsonlReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> GrebiJsonlWriter:
        return GrebiJsonlWriter(self.options, overwrite)

    def simpleStreamReader(self, schema: StructType) -> GrebiJsonlStreamReader:
        return GrebiJsonlStreamReader(schema, self.options)


def register(spark) -> None:
    """Idempotent per-session registration."""
    key = "grebi_jsonl_registered"
    if spark.conf.get(f"spark.grebi.{key}", None) == "true":
        return
    spark.dataSource.register(GrebiJsonlDataSource)
    spark.conf.set(f"spark.grebi.{key}", "true")
