"""Sinks + input dispatch: parquet canonical sink, local markdown export,
docs pipe, directory resolution with excludes."""

from __future__ import annotations

import os

from ai_knowledge_etl_spark.operators import sinks
from ai_knowledge_etl_spark.sources import detect
from ai_knowledge_etl_spark.sources.catalog import load_table


def test_markdown_export_roundtrip(spark, sf_dir, tmp_path):
    pages = sinks.markdown_page_rows(
        load_table(spark, sf_dir, "documents").limit(5)
    )
    n = sinks.export_markdown_pages(pages, str(tmp_path))
    assert n == 5
    files = sorted(os.listdir(tmp_path / "pages"))
    assert len(files) == 10  # 5 pages + 5 .summary sidecars
    md = [f for f in files if f.endswith(".md")]
    body = (tmp_path / "pages" / md[0]).read_text()
    sidecar = (tmp_path / "pages" / md[0].replace(".md", ".summary")).read_text()
    assert body.startswith(sidecar[:50])  # summary is a prefix of the page
    assert len(sidecar) <= 500


def test_pages_parquet_sink_prunes_summary(spark, sf_dir, tmp_path):
    pages = sinks.markdown_page_rows(load_table(spark, sf_dir, "documents"))
    out = str(tmp_path / "pages_pq")
    sinks.write_pages_parquet(pages, out)
    # the reference's 'read sidecar not page' trick is column pruning here
    plan = (
        spark.read.parquet(out)
        .select("summary")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "content" not in plan.lower().split("readschema")[-1][:200]


def test_pipe_docs_renders(spark, sf_dir):
    from ai_knowledge_etl_spark.registry import REGISTRY

    lines = REGISTRY["sink-index-report"].spark(spark, sf_dir)
    doc = sinks.pipe_docs(lines, "INDEX").first()["doc"]
    assert doc.startswith("# INDEX\n\n- [")
    assert doc.count("\n- [") >= 19  # 20 sources, sorted lines


def test_resolve_directory_excludes(spark, tmp_path):
    (tmp_path / "keep").mkdir()
    (tmp_path / "node_modules").mkdir()
    (tmp_path / "keep" / "a.txt").write_text("hello")
    (tmp_path / "node_modules" / "b.txt").write_text("junk")
    df = detect.resolve(spark, str(tmp_path) + "/")
    paths = [r["path"] for r in df.select("path").collect()]
    assert any("a.txt" in p for p in paths)
    assert not any("node_modules" in p for p in paths)


def test_resolve_url_is_frontier_row(spark):
    df = detect.resolve(spark, "https://example.com/x")
    assert df.columns == ["url"] and df.count() == 1


def test_scan_git_repo(spark, tmp_path):
    # this repo itself is the fixture: shallow-clone file://… and scan docs
    df = detect.scan_git_repo(spark, "file:///root/repo", str(tmp_path))
    paths = [r["path"] for r in df.select("path").collect()]
    assert any(p.endswith("README.md") for p in paths)
    assert not any("/.git/" in p for p in paths)


def test_incremental_upsert_rewrites_only_touched_buckets(
    spark, sf_dir, tmp_path
):
    """upsert_parquet: merge correctness AND incrementality — an update
    batch touching a few keys must leave every other bucket's files
    untouched on disk (that pruning is the whole point at 100 TB)."""
    import time

    from pyspark.sql import functions as F

    from ai_knowledge_etl_spark.operators import incremental

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.lit(1).alias("rev"), F.md5("text").alias("fp")
    )
    path = str(tmp_path / "inc")
    incremental.upsert_parquet(spark, path, docs, n_buckets=8)

    def bucket_mtimes() -> dict[str, float]:
        out = {}
        for d in os.listdir(path):
            if d.startswith("__bucket="):
                full = os.path.join(path, d)
                out[d] = max(
                    os.path.getmtime(os.path.join(full, f))
                    for f in os.listdir(full)
                    if f.endswith(".parquet")
                )
        return out

    before = bucket_mtimes()
    assert len(before) == 8
    time.sleep(1.1)

    updates = docs.where("doc_id IN (3, 17)").withColumn("rev", F.lit(2))
    touched = {
        f"__bucket={r[0]}"
        for r in updates.select(
            F.pmod(F.xxhash64("doc_id"), F.lit(8))
        ).collect()
    }
    incremental.upsert_parquet(spark, path, updates, n_buckets=8)
    after = bucket_mtimes()

    for b in before:
        if b in touched:
            assert after[b] > before[b], f"{b} should have been rewritten"
        else:
            assert after[b] == before[b], f"{b} rewritten needlessly"

    merged = spark.read.parquet(path)
    assert merged.count() == docs.count()  # upsert, not append
    revs = {
        r["doc_id"]: r["rev"]
        for r in merged.where("doc_id IN (3, 17, 4)").collect()
    }
    assert revs[3] == 2 and revs[17] == 2 and revs[4] == 1


def test_compaction_rewrites_only_small_files(spark, sf_dir, tmp_path):
    """compact_parquet: many tiny files + one healthy file -> tiny files
    bin-packed into few outputs, healthy file left alone, row parity."""
    from pyspark.sql import functions as F

    from ai_knowledge_etl_spark.operators import compaction

    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "frag")
    # 16 tiny files
    docs.where("doc_id % 2 = 0").repartition(16).write.mode(
        "overwrite"
    ).parquet(src)
    # plus one healthy (big-enough) file alongside
    docs.where("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)

    target = 64 * 1024  # 64 KB target so fixture files count as "small"
    small, n_out = compaction.plan_compaction(src, target_bytes=target)
    assert len(small) >= 16 and n_out >= 1

    out = str(tmp_path / "compact")
    stats = compaction.compact_parquet(spark, src, out, target_bytes=target)
    assert stats["compacted_files"] == len(small)
    assert stats["output_files"] < len(small)  # actually fewer files
    n_rows_out = spark.read.parquet(out).count()
    n_rows_small = spark.read.parquet(*small).count()
    assert n_rows_out == n_rows_small  # no row lost or duplicated


def test_schema_evolution_file_level_merge(spark, sf_dir, tmp_path):
    """mergeSchema over really-drifted parquet dirs: v2 added a column;
    unified read NULL-fills v1 rows and keeps v2 values."""
    from pyspark.sql import functions as F

    from ai_knowledge_etl_spark.sources import evolution

    docs = load_table(spark, sf_dir, "documents")
    p1 = str(tmp_path / "batch1")
    p2 = str(tmp_path / "batch2")
    docs.where("doc_id % 2 = 0").select("doc_id", "source").write.parquet(p1)
    docs.where("doc_id % 2 = 1").select(
        "doc_id", "source", F.lit(0.5).alias("quality_score")
    ).write.parquet(p2)

    merged = evolution.read_merged(spark, p1, p2)
    assert set(merged.columns) == {"doc_id", "source", "quality_score"}
    assert merged.count() == docs.count()
    v1_nulls = merged.where("doc_id % 2 = 0 AND quality_score IS NULL").count()
    assert v1_nulls == docs.where("doc_id % 2 = 0").count()
    assert merged.where("quality_score = 0.5").count() == docs.where(
        "doc_id % 2 = 1"
    ).count()


def test_csv_jsonl_text_roundtrip(spark, sf_dir, tmp_path):
    """Source-format completeness: the engine reads back csv, json-lines,
    and text files it wrote, schema intact (the reference ingests
    directories of heterogeneous files; these are the tabular formats)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    n = docs.count()

    csv_p = str(tmp_path / "csv")
    docs.write.option("header", True).csv(csv_p)
    back_csv = (
        spark.read.option("header", True)
        .schema(docs.schema)
        .csv(csv_p)
    )
    assert back_csv.count() == n
    assert back_csv.schema == docs.schema

    json_p = str(tmp_path / "jsonl")
    docs.write.json(json_p)
    back_json = spark.read.schema(docs.schema).json(json_p)
    assert back_json.count() == n
    assert (
        back_json.agg(F.sum("n_chars")).first()[0]
        == docs.agg(F.sum("n_chars")).first()[0]
    )

    txt_p = str(tmp_path / "txt")
    docs.select(
        F.concat_ws("\t", "doc_id", "source").alias("value")
    ).write.text(txt_p)
    back_txt = spark.read.text(txt_p)
    assert back_txt.count() == n
    parsed = back_txt.select(
        F.split("value", "\t")[0].cast("long").alias("doc_id")
    )
    assert parsed.where("doc_id IS NULL").count() == 0


def test_hive_partition_pruning(spark, sf_dir, tmp_path):
    """Partition layout + pruning: a table written partitioned by
    event_type must scan ONLY the matching directory when filtered —
    PartitionFilters in the plan, and strictly fewer files read."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "by_type")
    ev.write.partitionBy("event_type").parquet(path)

    all_read = spark.read.parquet(path)
    clicks = all_read.where(F.col("event_type") == "click")
    plan = clicks._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    # row parity with the unpartitioned source
    assert clicks.count() == ev.where("event_type = 'click'").count()
    # the pruned scan touches only the one partition directory
    import os

    n_dirs = sum(
        1 for d in os.listdir(path) if d.startswith("event_type=")
    )
    assert n_dirs >= 4  # several partitions exist, we read just one


def test_file_provenance_metadata_column(spark, sf_dir, tmp_path):
    """Lineage: the hidden _metadata column exposes source file path and
    size per row — how a 100 TB pipeline traces any bad record back to
    the exact input file without storing provenance columns."""
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "prov")
    docs.repartition(4).write.parquet(path)

    with_prov = spark.read.parquet(path).select(
        "doc_id",
        "_metadata.file_path",
        "_metadata.file_size",
    )
    rows = with_prov.collect()
    assert len(rows) == docs.count()
    files = {r["file_path"] for r in rows}
    assert len(files) == 4  # one provenance path per written file
    assert all(r["file_path"].endswith(".parquet") for r in rows)
    assert all(r["file_size"] > 0 for r in rows)


def test_versioned_upsert_time_travel_and_vacuum(spark, sf_dir, tmp_path):
    """Manifest-based time travel on plain parquet: three upsert
    versions, each snapshot readable as-of its manifest; vacuum drops
    unreferenced version dirs but keeps every file current snapshots
    need."""
    from pyspark.sql import functions as F

    from ai_knowledge_etl_spark.operators import incremental as inc

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lit(1).alias("rev"), F.md5("text").alias("fp")
    )
    path = str(tmp_path / "vt")
    v1 = inc.upsert_parquet_versioned(spark, path, docs, n_buckets=4)
    upd2 = docs.where("doc_id % 10 = 0").withColumn("rev", F.lit(2))
    v2 = inc.upsert_parquet_versioned(spark, path, upd2, n_buckets=4)
    upd3 = docs.where("doc_id = 7").withColumn("rev", F.lit(3))
    v3 = inc.upsert_parquet_versioned(spark, path, upd3, n_buckets=4)
    assert (v1, v2, v3) == (1, 2, 3)

    n = docs.count()
    snap1 = inc.read_version(spark, path, 1)
    snap2 = inc.read_version(spark, path, 2)
    snap3 = inc.read_version(spark, path)  # latest
    assert snap1.count() == snap2.count() == snap3.count() == n

    # v1: everything rev 1; v2: %10 rows rev 2; v3: additionally doc 7 rev 3
    assert snap1.where("rev > 1").count() == 0
    assert (
        snap2.where("rev = 2").count()
        == docs.where("doc_id % 10 = 0").count()
    )
    assert snap2.where("doc_id = 7").first()["rev"] == 1
    assert snap3.where("doc_id = 7").first()["rev"] == 3

    removed = inc.vacuum(path, keep_last=2)
    # v1's dir may still be referenced by v2/v3 manifests (untouched
    # buckets) — vacuum must never remove referenced dirs
    for d in removed:
        assert d == "v1" or d.startswith("v")
    # snapshots 2 and 3 still read fine after vacuum
    assert inc.read_version(spark, path, 3).count() == n
    assert inc.read_version(spark, path, 2).where("rev = 2").count() > 0


def test_table_changes_between_versions(spark, sf_dir, tmp_path):
    """Change feed over the versioned table: only the rows the v2 batch
    touched surface as updates; everything else reads unchanged."""
    from pyspark.sql import functions as F

    from ai_knowledge_etl_spark.operators import incremental as inc

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lit(1).alias("rev"), F.md5("text").alias("fp")
    )
    path = str(tmp_path / "cf")
    inc.upsert_parquet_versioned(spark, path, docs, n_buckets=4)
    upd = (
        docs.where("doc_id % 25 = 0")
        .withColumn("rev", F.lit(2))
        .withColumn("fp", F.md5(F.concat(F.col("fp"), F.lit("x"))))
    )
    inc.upsert_parquet_versioned(spark, path, upd, n_buckets=4)

    feed = inc.table_changes(spark, path, 1, 2)
    by_action = {
        r["action"]: r["n"]
        for r in feed.groupBy("action").agg(F.count("*").alias("n")).collect()
    }
    n_upd = docs.where("doc_id % 25 = 0").count()
    assert by_action.get("update", 0) == n_upd
    assert by_action.get("unchanged", 0) == docs.count() - n_upd
    assert "insert" not in by_action and "delete" not in by_action


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC source-format coverage (same contract as the csv/jsonl test):
    values and schema survive the round trip; no oracle (DuckDB reads no
    ORC), so parquet content is the reference."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    p = str(tmp_path / "orc")
    docs.write.orc(p)
    back = spark.read.orc(p)
    assert back.schema == docs.schema
    assert back.count() == docs.count()
    ref = {r["doc_id"]: r for r in docs.collect()}
    for r in back.collect():
        assert ref[r["doc_id"]] == r


def test_pagesource_filter_pushdown_and_partition_pruning():
    """Pure-Python contract of the crawlpages DataSource reader: domain
    equality prunes partition planning to one shard; depth predicates are
    absorbed (not returned for post-scan evaluation); unsupported filters
    are handed back to Spark."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, LessThan

    from ai_knowledge_etl_spark.sources.pagesource import (
        N_DOMAINS,
        CrawlPagesReader,
    )

    r = CrawlPagesReader({"n": "70"})
    assert len(r.partitions()) == N_DOMAINS

    leftover = list(
        r.pushFilters(
            [
                EqualTo(("domain",), "site3.example.com"),
                LessThan(("depth",), 2),
                GreaterThan(("page_id",), 5),  # unsupported -> back to Spark
            ]
        )
    )
    assert len(leftover) == 1 and leftover[0].attribute == ("page_id",)
    parts = r.partitions()
    assert len(parts) == 1  # pruned to the single owning shard

    rows = list(r.read(parts[0]))
    # 70 pages over 7 domains -> 10 on site3 (pids 3,10,...,66); depth<2
    # keeps pid%4 in {0,1}
    assert all(row[2] == "site3.example.com" and row[3] < 2 for row in rows)
    expect = [p for p in range(3, 70, 7) if p % 4 < 2]
    assert [row[0] for row in rows] == expect


def test_pagesource_e2e_pruned_scan(spark):
    """End-to-end through Spark: a domain-filtered read returns exactly
    that shard's rows, and the depth pushdown never materializes
    filtered rows."""
    from ai_knowledge_etl_spark.sources.catalog import (
        ensure_package_on_workers,
    )
    from ai_knowledge_etl_spark.sources.pagesource import (
        CrawlPagesDataSource,
    )

    ensure_package_on_workers(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(CrawlPagesDataSource)
    df = (
        spark.read.format("crawlpages")
        .option("n", 70)
        .load()
        .where("domain = 'site5.example.com' AND depth = 1")
    )
    got = sorted(r["page_id"] for r in df.collect())
    assert got == [p for p in range(5, 70, 7) if p % 4 == 1]


def test_pagesource_writer_commit_protocol(spark, sf_dir, tmp_path):
    """Write-side connector: tasks stage to uuid files, driver commit
    publishes part files + a MANIFEST whose per-file row counts sum to
    the input; no staging orphans survive a successful run."""
    import json
    import os

    from ai_knowledge_etl_spark.sources.catalog import (
        ensure_package_on_workers,
        load_table,
    )
    from ai_knowledge_etl_spark.sources.pagesource import (
        CrawlPagesDataSource,
    )

    ensure_package_on_workers(spark)
    spark.dataSource.register(CrawlPagesDataSource)
    out = str(tmp_path / "jsonl_out")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "n_chars")
        .repartition(4)
    )
    n_in = docs.count()
    docs.write.format("crawlpages").option("path", out).mode("append").save()

    manifest = json.load(open(os.path.join(out, "MANIFEST.json")))
    files = sorted(os.listdir(out))
    assert "MANIFEST.json" in files
    parts = [f for f in files if f.startswith("part-")]
    assert sorted(m["file"] for m in manifest["files"]) == parts
    assert sum(m["n_rows"] for m in manifest["files"]) == n_in
    # commit() clears the staging area entirely — orphaned attempts from
    # failed/speculative tasks must not accumulate across runs (ADVICE r1)
    assert not os.path.exists(os.path.join(out, "_staging"))

    got_ids = set()
    for p in parts:
        with open(os.path.join(out, p)) as f:
            for line in f:
                got_ids.add(json.loads(line)["doc_id"])
    want_ids = {r["doc_id"] for r in docs.collect()}
    assert got_ids == want_ids

    # append into a published dir is refused (no atomic append story);
    # overwrite replaces the batch with no stale parts left behind
    import pytest as _pytest

    with _pytest.raises(Exception, match="already holds a published batch"):
        docs.write.format("crawlpages").option("path", out).mode(
            "append"
        ).save()
    fewer = docs.limit(50).repartition(1)
    fewer.write.format("crawlpages").option("path", out).mode(
        "overwrite"
    ).save()
    manifest2 = json.load(open(os.path.join(out, "MANIFEST.json")))
    parts2 = sorted(
        f for f in os.listdir(out) if f.startswith("part-")
    )
    # the 4-task batch's extra part files are gone; listing == manifest
    assert sorted(m["file"] for m in manifest2["files"]) == parts2
    assert sum(m["n_rows"] for m in manifest2["files"]) == 50


def test_warc_parser_edges():
    """Direct parser edge cases: empty file, trailing garbage, a header
    block without Content-Length (resync), payload hitting EOF."""
    from ai_knowledge_etl_spark.sources.warc import parse_warc_bytes

    def rec(uri: str, payload: bytes) -> bytes:
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
            + uri.encode()
            + b"\r\nContent-Length: "
            + str(len(payload)).encode()
            + b"\r\n\r\n"
            + payload
            + b"\r\n\r\n"
        )

    assert parse_warc_bytes(b"") == ([], 0)
    assert parse_warc_bytes(b"no records here") == ([], 15)

    two = rec("http://a", b"AAAA") + rec("http://b", b"BB")
    recs, skipped = parse_warc_bytes(two)
    assert skipped == 0
    assert [(u, n) for u, n, _, _ in recs] == [("http://a", 4), ("http://b", 2)]
    assert recs[0][3] == 0 and recs[1][3] == len(rec("http://a", b"AAAA"))

    # header without Content-Length: resync past it, next record survives
    bad = b"WARC/1.0\r\nWARC-Type: broken\r\n\r\n" + rec("http://c", b"C")
    recs, skipped = parse_warc_bytes(bad)
    assert [u for u, *_ in recs] == ["http://c"] and skipped > 0

    # truncated payload: record reports what's actually there
    trunc = rec("http://d", b"DDDD")[:-8]  # cuts into the payload
    recs, _ = parse_warc_bytes(trunc)
    assert recs[0][0] == "http://d" and recs[0][1] < 4 or recs[0][1] == 2


def test_incremental_upsert_raises_on_unreadable_existing_table(
    spark, sf_dir, tmp_path
):
    """Regression (round-3 advisor): a pre-existing but UNREADABLE table
    (corrupted footer / transient FS error) must raise, not be treated as
    'no table yet' — that branch dynamic-overwrites the touched buckets
    with batch-only rows, silently dropping every pre-existing key in a
    sink documented as exactly-once under replay."""
    import pytest
    from pyspark.sql import functions as F

    from ai_knowledge_etl_spark.operators import incremental

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lit(1).alias("rev"), F.md5("text").alias("fp")
    )
    path = str(tmp_path / "corrupt")
    os.makedirs(path)
    with open(os.path.join(path, "part-00000.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")

    assert incremental.table_exists(spark, path)
    with pytest.raises(Exception):
        incremental.upsert_parquet(spark, path, docs, n_buckets=8)
    # the corrupt file must still be there — nothing overwritten
    with open(os.path.join(path, "part-00000.parquet"), "rb") as f:
        assert f.read() == b"this is not a parquet file"

    # bootstrap on a genuinely-absent path still works
    fresh = str(tmp_path / "fresh")
    assert not incremental.table_exists(spark, fresh)
    incremental.upsert_parquet(spark, fresh, docs, n_buckets=8)
    assert spark.read.parquet(fresh).count() == docs.count()


def test_txnlog_commit_protocol(spark, sf_dir, tmp_path):
    """Transaction-log guarantees: no half-commits visible (temp+rename),
    lost-update guard (double-claiming a version raises), and time travel
    reconstructs every historical snapshot after a compaction rewrote the
    physical files."""
    import pytest as _pytest

    from ai_knowledge_etl_spark.operators import txnlog

    table = str(tmp_path / "t")
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    f0 = txnlog.write_files(spark, df.where("id < 5"), table, "a", 1)
    txnlog.commit(table, 0, adds=f0, removes=[], op="create")
    f1 = txnlog.write_files(spark, df.where("id >= 5"), table, "b", 1)
    txnlog.commit(table, 1, adds=f1, removes=[], op="append")
    # lost-update guard: a racing writer cannot re-claim version 1
    with _pytest.raises(FileExistsError):
        txnlog.commit(table, 1, adds=f1, removes=[], op="dup")
    # compaction rewrites physical files, logical rows unchanged
    c = txnlog.write_files(
        spark, txnlog.snapshot(spark, table, 1), table, "c", 1
    )
    txnlog.commit(table, 2, adds=c, removes=f0 + f1, op="compact")
    assert txnlog.live_files(table, 2) == c
    rows_v0 = {r["id"] for r in txnlog.snapshot(spark, table, 0).collect()}
    rows_v2 = {r["id"] for r in txnlog.snapshot(spark, table, 2).collect()}
    assert rows_v0 == set(range(5))
    assert rows_v2 == set(range(10))


def test_txnlog_concurrent_writers_one_wins(spark, tmp_path):
    """Two interleaved writers racing to claim the same version: exactly
    one commit() must win and the loser must observe FileExistsError and
    retry cleanly at the next version — the optimistic-concurrency
    guarantee a 100 TB lakehouse table needs (put-if-absent on the version
    object; Delta _delta_log semantics). The publish step is os.link,
    which is atomic fail-if-exists, so there is no TOCTOU window: both
    writers pass any pre-check simultaneously and the filesystem still
    serializes them. A barrier lines the two threads up at the commit
    call to make the race deterministic-by-construction."""
    import threading

    from ai_knowledge_etl_spark.operators import txnlog

    table = str(tmp_path / "race")
    df = spark.range(4).selectExpr("id", "id AS v")
    fa = txnlog.write_files(spark, df.where("id < 2"), table, "wa", 1)
    fb = txnlog.write_files(spark, df.where("id >= 2"), table, "wb", 1)

    barrier = threading.Barrier(2)
    outcome: dict[str, object] = {}

    def writer(name: str, adds: list[str]) -> None:
        barrier.wait()  # both threads hit commit(version=0) together
        try:
            txnlog.commit(table, 0, adds=adds, removes=[], op=f"create-{name}")
            outcome[name] = "won"
        except FileExistsError:
            # Loser's retry protocol: re-read the log tip, claim next.
            txnlog.commit(table, 1, adds=adds, removes=[], op=f"retry-{name}")
            outcome[name] = "retried"

    t1 = threading.Thread(target=writer, args=("a", fa))
    t2 = threading.Thread(target=writer, args=("b", fb))
    t1.start(); t2.start(); t1.join(); t2.join()

    # Exactly one winner, one clean retry — never two wins (lost update)
    # and never two losses (livelock).
    assert sorted(outcome.values()) == ["retried", "won"]
    # Both commits landed; no staging files leaked.
    assert txnlog.live_files(table, 1) == sorted(fa + fb)
    log_dir = os.path.join(table, "_log")
    assert sorted(os.listdir(log_dir)) == ["00000.json", "00001.json"]
    # Full table readable — neither writer's data was lost.
    rows = {r["id"] for r in txnlog.snapshot(spark, table).collect()}
    assert rows == {0, 1, 2, 3}


def test_merge_agg_partials_retraction_zeroes_group(spark):
    """A group fully retracted by a negative partial must reach count 0
    (callers filter it); surviving groups must sum partials exactly."""
    from pyspark.sql import functions as F

    from ai_knowledge_etl_spark.operators.incremental import (
        merge_agg_partials,
    )

    mv = spark.createDataFrame(
        [("a", 2, 100), ("b", 1, 7)], "k string, n long, s long"
    )
    delta = spark.createDataFrame([("a", 3, 50)], "k string, n long, s long")
    retract = spark.createDataFrame(
        [("b", -1, -7)], "k string, n long, s long"
    )
    out = {
        r["k"]: (r["n"], r["s"])
        for r in merge_agg_partials(
            [mv, delta, retract], ["k"], ["n", "s"]
        ).collect()
    }
    assert out == {"a": (5, 150), "b": (0, 0)}


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(-50, 50)),
    min_size=1,
    max_size=24,
)
_cuts = st.lists(st.integers(0, 23), max_size=3)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows, cuts=_cuts)
def test_merge_agg_partials_is_partition_invariant(spark, rows, cuts):
    """ANY split of the rows into delta batches must merge to the direct
    aggregate — the property the incremental-MV correctness rests on
    (hypothesis picks adversarial splits: empty slices, single rows,
    negative values acting as retractions)."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from ai_knowledge_etl_spark.operators.incremental import (
        merge_agg_partials,
    )

    bounds = sorted({c for c in cuts if c < len(rows)} | {0, len(rows)})
    slices = [
        rows[a:b] for a, b in zip(bounds, bounds[1:]) if rows[a:b]
    ] or [rows]
    partials = [
        spark.createDataFrame(s, "k string, v long")
        .groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("v").cast("long").alias("s"),
        )
        for s in slices
    ]
    got = {
        r["k"]: (r["n"], r["s"])
        for r in merge_agg_partials(partials, ["k"], ["n", "s"]).collect()
    }
    want = defaultdict(lambda: [0, 0])
    for k, v in rows:
        want[k][0] += 1
        want[k][1] += v
    assert got == {k: tuple(v) for k, v in want.items()}
