"""Spark-4 Python DataSource connector: deterministic synthetic crawl pages.

This is the connector surface of the reference's web-scan layer
(scripts/extract-jina.sh:61-83, commands/extract.md:449-456) re-expressed
as a *planned, partitioned scan* instead of a per-URL driver loop: N pages
sharded into one input partition per domain, each partition read
independently — exactly where a real deployment plugs the fetcher,
politeness, and retry hooks of sources/web.py.

Rows are derived purely from md5(page_id), so a SQL engine can regenerate
them bit-for-bit: the driver's oracle parity check proves the connector
emitted byte-identical CONTENT, not just matching row counts.

Implements the two capabilities that matter at 100 TB:

- **partition planning**: `partitions()` returns one `InputPartition` per
  domain, so fetch work is co-located per site (per-domain politeness
  needs exactly this layout — streaming/politeness.py);
- **filter pushdown** (`pushFilters`, Spark 4.1 Python DS API):
  depth predicates (`=`, `<`, `>`) are evaluated inside the generator so
  filtered rows are never materialized, and `domain = 'siteK...'`
  additionally PRUNES partition planning to the single shard owning that
  domain — the Python-DataSource analog of partition pruning.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    InputPartition,
    LessThan,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

N_DOMAINS = 7
SCHEMA = "page_id bigint, url string, domain string, depth int, html string"


def _domain(site: int) -> str:
    return f"site{site}.example.com"


def _row(pid: int) -> tuple:
    h = hashlib.md5(str(pid).encode()).hexdigest()
    dom = _domain(pid % N_DOMAINS)
    return (
        pid,
        f"https://{dom}/p/{pid}",
        dom,
        pid % 4,
        f"<h1>{h[:8]}</h1><p>{h[8:24]}</p>",
    )


class CrawlPagesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 300))
        # pushed-down predicate state (pickled to executors with self)
        self.domain_eq: str | None = None
        self.depth_eq: int | None = None
        self.depth_lt: int | None = None
        self.depth_gt: int | None = None

    def pushFilters(self, filters: Sequence[Filter]) -> Iterator[Filter]:
        for f in filters:
            col = f.attribute[-1] if f.attribute else None
            if isinstance(f, EqualTo) and col == "domain":
                self.domain_eq = f.value
            elif isinstance(f, EqualTo) and col == "depth":
                self.depth_eq = int(f.value)
            elif isinstance(f, LessThan) and col == "depth":
                self.depth_lt = int(f.value)
            elif isinstance(f, GreaterThan) and col == "depth":
                self.depth_gt = int(f.value)
            else:
                yield f  # unsupported: Spark evaluates it post-scan

    def partitions(self) -> list[InputPartition]:
        sites = range(N_DOMAINS)
        if self.domain_eq is not None:
            # partition pruning: only the shard owning the requested domain
            sites = [s for s in sites if _domain(s) == self.domain_eq]
        return [InputPartition(s) for s in sites]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        site = partition.value
        for pid in range(site, self.n, N_DOMAINS):
            depth = pid % 4
            if self.depth_eq is not None and depth != self.depth_eq:
                continue
            if self.depth_lt is not None and depth >= self.depth_lt:
                continue
            if self.depth_gt is not None and depth <= self.depth_gt:
                continue
            yield _row(pid)


class CrawlPagesStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of the batch reader: the crawl frontier as an
    unbounded source. Each micro-batch emits the next `batch_size` page
    ids; offsets are `{"pid": next_unread}` so a restarted query resumes
    exactly where the checkpoint says. `readBetweenOffsets` replays a
    committed range deterministically (same md5-derived rows), which is
    what makes the source exactly-once under failure recovery."""

    def __init__(self, options: dict):
        self.n = int(options.get("n", 300))
        self.batch_size = int(options.get("batch_size", 35))

    def initialOffset(self) -> dict:
        return {"pid": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = int(start["pid"])
        hi = min(lo + self.batch_size, self.n)
        return iter([_row(p) for p in range(lo, hi)]), {"pid": hi}

    def readBetweenOffsets(
        self, start: dict, end: dict
    ) -> Iterator[tuple]:
        return iter([_row(p) for p in range(int(start["pid"]), int(end["pid"]))])


@dataclass
class _TaskFile(WriterCommitMessage):
    """One task's staged output: (staging path, row count)."""

    path: str
    n_rows: int


class JsonlDirWriter(DataSourceWriter):
    """Write-side half of the connector protocol: each task streams its
    partition to a UNIQUELY-NAMED staging file (uuid — task retries or
    speculative duplicates can never collide), returns a commit message,
    and only the DRIVER's commit() publishes the run: staged files are
    renamed into place and a MANIFEST records exactly the published file
    set with row counts. abort() removes the orphans instead. Readers who
    honor the manifest therefore see an atomic all-or-nothing batch —
    the same staging-plus-manifest discipline the incremental/versioned
    sinks use (operators/incremental.py), here at the DataSource V2 API
    level. Reference analog: the per-page sink writes of
    agents/extractor.md:376-384, made failure-atomic."""

    def __init__(self, options: dict, overwrite: bool = True):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator) -> _TaskFile:
        import json
        import os
        import uuid

        os.makedirs(os.path.join(self.path, "_staging"), exist_ok=True)
        staged = os.path.join(self.path, "_staging", f"{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _TaskFile(path=staged, n_rows=n)

    def commit(self, messages) -> None:
        import glob
        import json
        import os

        # Honor the save mode BEFORE publishing: a prior batch's part files
        # must not survive next to a manifest that omits them (a directory
        # lister would see mixed batches). overwrite clears them; a
        # non-overwrite save into a non-empty dir is refused — append to a
        # manifest-published dir has no atomic story at this API level.
        stale = glob.glob(os.path.join(self.path, "part-*.jsonl"))
        if stale and not self.overwrite:
            raise FileExistsError(
                f"{self.path} already holds a published batch; "
                "use mode('overwrite') to replace it"
            )
        for p in stale:
            os.remove(p)
        published = []
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{i:05d}.jsonl")
            os.replace(m.path, final)
            published.append(
                {"file": os.path.basename(final), "n_rows": m.n_rows}
            )
        with open(os.path.join(self.path, "MANIFEST.json"), "w") as f:
            json.dump({"files": published}, f)
        # Staged files whose commit message never reached the driver
        # (failed/speculative attempts) are by construction uncommitted —
        # clear the staging area so orphans can't accumulate across runs.
        staging = os.path.join(self.path, "_staging")
        for leftover in glob.glob(os.path.join(staging, "*")):
            os.remove(leftover)
        if os.path.isdir(staging):
            os.rmdir(staging)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class CrawlPagesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "crawlpages"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> CrawlPagesReader:
        return CrawlPagesReader(self.options)

    def simpleStreamReader(self, schema) -> CrawlPagesStreamReader:
        return CrawlPagesStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> JsonlDirWriter:
        return JsonlDirWriter(self.options, overwrite=overwrite)
