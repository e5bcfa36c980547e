"""Input-source detection + routing (reference: DESIGN.md:492-513,
commands/extract.md:347-356,993-1009).

`classify_input` is the column form (url/glob/directory/file from the raw
string shape); `resolve` is the driver-side dispatch that turns a raw input
into a DataFrame via the right Spark reader — the engine's front door.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def classify_input(raw: Column | str) -> Column:
    """Raw input string → url | glob | directory | file."""
    r = F.col(raw) if isinstance(raw, str) else raw
    return (
        F.when(r.like("http%"), F.lit("url"))
        .when(r.like("%*%"), F.lit("glob"))
        .when(r.like("%/"), F.lit("directory"))
        .otherwise(F.lit("file"))
    )


def scan_git_repo(
    spark: SparkSession, repo_url: str, workdir: str, globs: str = "{*.md,*.rst,*.txt}"
) -> DataFrame:
    """Shallow clone → scan README + docs (reference:
    commands/extract.md:912-929). The clone is driver-side (one repo, small);
    the scan fans out through the binaryFile reader like any directory."""
    import subprocess

    dest = os.path.join(workdir, "repo")
    subprocess.run(
        ["git", "clone", "--depth", "1", "--quiet", repo_url, dest],
        check=True,
        capture_output=True,
    )
    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", globs)
        .load(dest)
        .where(~F.input_file_name().rlike(r"/\.git/"))
    )


def resolve(spark: SparkSession, raw: str) -> DataFrame:
    """Dispatch a raw input to the right scan (reference: DESIGN.md:492-513).

    - url        → a 1-row frontier DataFrame (feed to streaming/frontier +
                   sources/web.fetch_urls)
    - glob/file  → binaryFile scan (glob paths are native to spark.read)
    - directory  → recursive binaryFile scan with the reference's exclude
                   dirs (DESIGN.md:517-565) applied as a path filter
    """
    kind_row = (
        spark.range(1).select(classify_input(F.lit(raw)).alias("k")).first()
    )
    kind = kind_row["k"]
    if kind == "url":
        return spark.createDataFrame([(raw,)], "url string")
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
    )
    if kind == "directory":
        df = reader.load(raw)
        excludes = r"(node_modules|\.git|__pycache__|\.venv|dist|build)/"
        return df.where(~F.input_file_name().rlike(excludes))
    return reader.load(raw)  # file or glob — both native to load()
