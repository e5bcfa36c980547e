"""Registry hygiene at saturation (round-5 verdict #8): with 292 oracled
queries the risk flips from missing coverage to redundant coverage. The
oracle-skeleton audit (tools/oracle_audit.py) is pinned here so a new
query that duplicates an existing oracle's structure fails CI and forces
a deliberate decision — either consolidate it or allowlist it below with
a written reason.
"""

from __future__ import annotations

import hashlib
import os
import sys
from collections import defaultdict

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from oracle_audit import skeletonize  # noqa: E402

from ai_knowledge_etl_spark.registry import REGISTRY, oracle_of  # noqa: E402

# Every group of queries whose oracle SQLs share a structural skeleton
# (literals/aliases normalized) must be listed here with a reason. These
# are NOT duplicates to consolidate: each pair exists because two
# DIFFERENT Spark-side mechanisms are proven against the same batch truth
# — which is precisely the differential method.
ALLOWED_SKELETON_GROUPS = {
    # Two distinct source APIs (recursive directory listing vs glob
    # pattern resolution) that must produce the same file inventory;
    # identical oracle by construction.
    ("scan-directory", "scan-glob"),
    # Two distinct streaming mechanisms (foreachBatch incremental MV vs
    # transformWithStateInPandas typed ValueState) that must both
    # converge to the same batch groupBy answer; the shared oracle IS
    # the convergence claim.
    ("stream-incremental-mv", "stream-user-stats-tws"),
}


def test_no_unexplained_oracle_skeleton_duplicates():
    by_hash = defaultdict(list)
    for name in sorted(REGISTRY):
        sql = oracle_of(REGISTRY[name])
        if sql:
            sk = skeletonize(sql)
            by_hash[hashlib.sha256(sk.encode()).hexdigest()].append(name)
    groups = {tuple(sorted(v)) for v in by_hash.values() if len(v) > 1}
    unexplained = groups - ALLOWED_SKELETON_GROUPS
    stale = ALLOWED_SKELETON_GROUPS - groups
    assert not unexplained, (
        "new oracle-skeleton duplicates — consolidate or allowlist with "
        f"a reason: {sorted(unexplained)}"
    )
    assert not stale, (
        f"allowlist entries no longer duplicated — remove: {sorted(stale)}"
    )


def test_registry_docs_in_sync():
    """docs/REGISTRY.md is generated from the live QueryDef registry
    (round-7 verdict #8); any registry edit that moves a definition,
    changes a doc line, or adds/removes a query must regenerate it
    (`python tools/gen_registry_docs.py`)."""
    from gen_registry_docs import OUT, render

    with open(OUT) as f:
        on_disk = f.read()
    assert on_disk == render(), (
        "docs/REGISTRY.md is stale — rerun tools/gen_registry_docs.py"
    )
