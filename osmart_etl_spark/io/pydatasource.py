"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API): a
deterministic synthetic event-ledger source with REAL filter pushdown.

Why it exists: the reference reads from live MySQL databases and CSV
drops (etl_sales/extract.py, etl_inventory/seed_stock_points.py); the
engine covers those with JDBC and file sources. This source covers the
third kind every large pipeline grows — an API/generator-backed feed
with no file behind it — and demonstrates the full extension contract:
schema declaration, partition PLANNING (split count is an option, so
parallelism is a plan-time decision), per-partition generation on
executors (the driver never materializes rows), and `pushFilters`
(supported predicates are applied inside the generator loop; the rest
are returned to Spark for post-filtering, so correctness never depends
on what the source accepts).

Determinism contract: every row is a pure function of its event_id —
the SAME global row set appears for ANY partition count, which is what
makes backfills and replays reproducible (same philosophy as the
md5-gated sampling in queries/corpus_ops.py).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from datetime import datetime, timedelta
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThanOrEqual,
    InputPartition,
    SimpleDataSourceStreamReader,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_EVENT_TYPES = ("view", "click", "purchase", "error", "signup")
_EPOCH = datetime(2024, 3, 1)


def _row_for(event_id: int) -> tuple:
    """Pure function event_id -> row (the determinism contract)."""
    h = hashlib.md5(f"synth:{event_id}".encode()).digest()
    user_id = int.from_bytes(h[0:4], "big") % 1000
    etype = _EVENT_TYPES[h[4] % len(_EVENT_TYPES)]
    # value in [-50, 450), 2 decimal digits. NO sign handling here —
    # error-event negation happens downstream in the consumers
    # (daily_net_windowed / replay_stateful); flipping it at the source
    # too would double-negate every error aggregate.
    value = round((int.from_bytes(h[5:8], "big") % 50000) / 100.0 - 50.0, 2)
    ts = _EPOCH + timedelta(seconds=int.from_bytes(h[8:11], "big") % (30 * 86400))
    return (event_id, ts, user_id, etype, value)


@dataclass
class _Range(InputPartition):
    start: int
    end: int


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, schema: StructType, options) -> None:
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("partitions", 4))
        self.eq_type: str | None = None
        self.min_user: int | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept event_type equality and user_id >= bounds; yield back
        everything else (Spark re-applies what we don't handle).

        A CONSUMED filter is a promise to apply it, so duplicates must
        combine, not overwrite: multiple >= bounds fold to the MAX
        (applying the max applies them all); a second, DIFFERENT
        equality is yielded back so Spark enforces the contradiction
        (correctly yielding zero rows). The overwrite form of this
        method returned wrong results for `.filter(a).filter(b)`
        chains — caught by code review, pinned in tests."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("event_type",):
                if self.eq_type is None or self.eq_type == f.value:
                    self.eq_type = f.value
                else:
                    yield f
            elif isinstance(f, GreaterThanOrEqual) and f.attribute == ("user_id",):
                v = int(f.value)
                self.min_user = v if self.min_user is None else max(self.min_user, v)
            else:
                yield f

    def partitions(self) -> list[InputPartition]:
        per = max(1, -(-self.n_rows // self.n_parts))  # ceil division
        return [
            _Range(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _Range):
        for event_id in range(partition.start, partition.end):
            row = _row_for(event_id)
            if self.eq_type is not None and row[3] != self.eq_type:
                continue
            if self.min_user is not None and row[2] < self.min_user:
                continue
            yield row


class SyntheticEventsDataSource(DataSource):
    """`spark.read.format("synthetic_events")` after
    `spark.dataSource.register(SyntheticEventsDataSource)`.

    Options: n_rows (default 1000), partitions (default 4)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )

    def reader(self, schema: StructType) -> SyntheticEventsReader:
        return SyntheticEventsReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "JsonLinesWriter":
        return JsonLinesWriter(self.options, overwrite=overwrite)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same deterministic ledger: the offset
    is just the next event_id, so checkpoint recovery replays EXACTLY
    the rows a lost batch contained (``readBetweenOffsets``) — the
    source-side half of exactly-once. Batch size is an option, making
    ingest rate a plan-time knob."""

    def __init__(self, options) -> None:
        self.n_rows = int(options.get("n_rows", 1000))
        self.batch_rows = int(options.get("batch_rows", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        s = start["next"]
        e = min(s + self.batch_rows, self.n_rows)
        return iter([_row_for(i) for i in range(s, e)]), {"next": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row_for(i) for i in range(start["next"], end["next"])])


@dataclass
class _StagedFile(WriterCommitMessage):
    staged_path: str
    n_rows: int


class JsonLinesWriter(DataSourceWriter):
    """Write side of the extension contract, with the two-phase commit
    every distributed sink needs: each TASK writes to a staging name
    (``_staged-<uuid>.jsonl``), the DRIVER's ``commit`` renames the
    staged files into place and drops a ``_SUCCESS`` manifest listing
    them; ``abort`` removes staging debris. A reader that requires
    ``_SUCCESS`` (or reads only the manifest's files) therefore never
    sees a partial job — the same visibility rule as Hadoop's file
    output committer, in ~40 lines of Python. Speculative/retried task
    duplicates are resolved at commit time: only files named in commit
    messages are published."""

    def __init__(self, options, overwrite: bool = False) -> None:
        import uuid

        self.path = options.get("path")
        self.overwrite = overwrite
        # Generated ONCE on the driver and carried into every pickled
        # task copy: all of this job's staging shares the token, so
        # driver-side abort can remove even the staging of a task that
        # FAILED mid-write — whose path never reached the driver in any
        # commit message (the review's leftover-debris scenario).
        self.job_token = uuid.uuid4().hex[:12]
        if not self.path:
            raise ValueError("json_lines sink requires a 'path' option")

    def write(self, iterator) -> _StagedFile:
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        name = f"_staged-{self.job_token}-{uuid.uuid4().hex}.jsonl"
        full = os.path.join(self.path, name)
        n = 0
        with open(full, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _StagedFile(staged_path=full, n_rows=n)

    def commit(self, messages) -> None:
        import json
        import os
        import time
        import uuid as _uuid

        # Part names carry the job token: a second append to the same
        # path must never collide with (and clobber) an earlier job's
        # part files — deterministic part-00000 naming did exactly
        # that (code-review finding, pinned in tests).
        manifest_path = os.path.join(self.path, "_SUCCESS")
        published = []
        for i, m in enumerate(messages):
            if m is None:  # failed/unfinished task slot — nothing staged
                continue
            final = os.path.join(self.path, f"part-{self.job_token}-{i:05d}.jsonl")
            os.replace(m.staged_path, final)
            published.append({"file": os.path.basename(final), "n_rows": m.n_rows})
        # duplicate staged files from speculative/retried tasks whose
        # message lost the race: retire this job's leftover staging
        self._remove_job_staging()
        # Manifest update under a kernel flock (round 13, ADVICE r12):
        # the append path is a read-modify-write — two concurrent
        # committers without the lock would both read the same prior
        # list and the second write would erase the first job's files
        # from the manifest. The former O_EXCL lockfile + stale-mtime
        # sweep had a TOCTOU: committer A reads a stale mtime, B sweeps
        # the same stale lock and O_EXCL-creates a FRESH one, then A's
        # remove deletes B's fresh lock and two committers enter the
        # RMW together. flock has no staleness problem (the kernel
        # releases it when the holder dies, so there is nothing to
        # sweep) — reliable here because this sink is local-FS by
        # contract. The lock FILE persists; deleting it would break
        # mutual exclusion for a holder flocked on the unlinked inode.
        import fcntl

        lock = os.path.join(self.path, "_SUCCESS.lock")
        lock_fd = os.open(lock, os.O_CREAT | os.O_WRONLY)
        for attempt in range(200):
            try:
                fcntl.flock(lock_fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError:
                time.sleep(0.05)
        else:
            os.close(lock_fd)
            raise TimeoutError(f"could not acquire manifest lock {lock}")
        try:
            if self.overwrite:
                # retire ONLY the parts the prior manifest owned (plus
                # this path's orphans from crashed jobs) — never a
                # concurrent committer's freshly published files
                prior_owned = set()
                if os.path.exists(manifest_path):
                    with open(manifest_path) as f:
                        prior_owned = {
                            p["file"] for p in json.load(f).get("files", [])
                        }
                keep = {p["file"] for p in published}
                for name in os.listdir(self.path):
                    if name in prior_owned and name not in keep:
                        os.remove(os.path.join(self.path, name))
                manifest = published
            else:
                # append: the manifest accumulates so a _SUCCESS-honoring
                # reader sees every committed job, not just the last one
                prior = []
                if os.path.exists(manifest_path):
                    with open(manifest_path) as f:
                        prior = json.load(f).get("files", [])
                manifest = prior + published
            # atomic swap — a reader never observes a torn manifest
            tmp = manifest_path + f".tmp-{_uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                json.dump({"files": manifest}, f)
            os.replace(tmp, manifest_path)
        finally:
            fcntl.flock(lock_fd, fcntl.LOCK_UN)
            os.close(lock_fd)

    def _remove_job_staging(self) -> None:
        import os

        prefix = f"_staged-{self.job_token}-"
        if not os.path.isdir(self.path):
            return
        for name in os.listdir(self.path):
            if name.startswith(prefix):
                try:
                    os.remove(os.path.join(self.path, name))
                except FileNotFoundError:
                    pass

    def abort(self, messages) -> None:
        # messages contains None for unfinished tasks, and a task that
        # FAILED mid-write never reported its staged path at all — so
        # cleanup must sweep by the job token (known to the driver),
        # not by the message list.
        self._remove_job_staging()
