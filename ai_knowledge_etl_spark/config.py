"""Engine limits & scoring weights.

These re-specify the reference's public configuration surface
(reference: config/limits.yaml, config/security.yaml,
skills/relevance-scorer/SKILL.md) as plain Python constants. All regexes are
written in the common subset of Java regex (Spark `rlike`) and RE2 (DuckDB) —
no lookaround, no backreferences — so every filter is expressible identically
in both engines for differential testing.
"""

from __future__ import annotations

# --- relevance scoring weights (reference: skills/relevance-scorer/SKILL.md:92-119,
#     config/limits.yaml:112-119) ---
LINK_URL_WEIGHT = 3  # +3 when the URL matches the topic
LINK_ANCHOR_WEIGHT = 5  # +5 when the anchor text matches
LINK_CONTEXT_WEIGHT = 2  # +2 when the surrounding context matches
SCORE_CAP = 10

# --- preset multilingual relevance-pattern catalog (reference:
#     skills/relevance-scorer/references/patterns.md:1-64 — the curated
#     bilingual EN/中文 regex table per technology domain and doc type a
#     user reaching for --topic gets for free). Lowercase literals matched
#     against lower(text) so no engine-specific case folding is involved;
#     every pattern is in the Java∩RE2 subset (alternations + `.?` only)
#     and carries ONE capture group, the scoring-kernel contract
#     (functions/scoring.mention_count). Dict order is the catalog order —
#     probe fixtures index into it positionally. ---
TOPIC_PRESETS: dict[str, str] = {
    "api-development": (
        "(api|rest|graphql|endpoint|接口|端点|认证|authentication"
        "|oauth|jwt|token)"
    ),
    "frontend": (
        "(react|vue|angular|component|组件|ui|ux|css|样式"
        "|responsive|响应式)"
    ),
    "backend": (
        "(database|数据库|sql|nosql|server|服务器|microservice"
        "|微服务|cache|缓存)"
    ),
    "devops": (
        "(docker|kubernetes|ci/cd|deploy|部署|container|容器"
        "|pipeline|monitoring|监控)"
    ),
    "security": (
        "(security|安全|authentication|授权|encryption|加密"
        "|vulnerability|漏洞|owasp)"
    ),
    "getting-started": (
        "(getting.?started|quick.?start|入门|快速开始|tutorial"
        "|教程|guide|指南)"
    ),
    "reference-docs": (
        "(reference|参考|api.?docs|specification|规范|schema|模式)"
    ),
    "examples": "(example|示例|sample|demo|演示|cookbook|recipes)",
}

# page scoring (reference: skills/relevance-scorer/SKILL.md:69-86,123-155)
PAGE_TITLE_WEIGHT = 3  # +3 title match
PAGE_HEADING_WEIGHT = 2  # +2 per heading match, max 2 headings counted
PAGE_HEADING_MAX = 2
# density bonus: >=10 mentions -> +3, >=5 -> +2, >=2 -> +1
PAGE_DENSITY_TIERS = ((10, 3), (5, 2), (2, 1))

# queue priority parent bonus (reference: skills/relevance-scorer/SKILL.md:193-211)
PARENT_BONUS_HIGH = (8, 3)  # parent relevance >= 8 -> +3
PARENT_BONUS_MED = (5, 1)  # parent relevance >= 5 -> +1

# traversal banding (reference: skills/relevance-scorer/SKILL.md:157-189)
BAND_DFS_MIN = 8  # >=8: DFS deep-dive
BAND_BFS_MIN = 5  # 5-7: BFS
SKIP_THRESHOLD = 5  # <5: prune; also the enqueue threshold
MAX_DEPTH = 3

# crawl caps (reference: config/limits.yaml:101-106)
MAX_PAGES_DEFAULT = 20
MAX_PAGES_HARD = 50
REQUEST_INTERVAL_SECONDS = 2.0

# --- URL filtering (reference: scripts/crawler-queue.sh:199-218,
#     config/limits.yaml:187-202) ---
URL_SKIP_EXT_RE = (
    r"\.(pdf|zip|tar|gz|rar|7z|exe|dmg|pkg|iso|mp4|mp3|avi|mov|mkv|wav"
    r"|woff|woff2|ttf|eot|otf|css|js|map|ico)([?#]|$)"
)
URL_SKIP_PATH_RE = (
    r"(login|signin|sign-in|signup|sign-up|register|logout|password"
    r"|cart|checkout|payment|account|profile|settings"
    r"|privacy|terms|legal|cookie"
    r"|/static/|/assets/|/cdn/|/fonts/)"
)

# --- image filtering (reference: commands/extract.md:474-489,
#     config/limits.yaml:56-74) ---
IMAGE_MIN_WIDTH = 100
IMAGE_MIN_HEIGHT = 100
IMAGE_SKIP_RE = (
    r"(icon|logo|avatar|badge|button|sprite|spacer|pixel|tracking|banner|ad[sv]?[-_./])"
)
IMAGES_PER_PAGE_CAP = 5
IMAGES_PER_SESSION_CAP = 15

# --- security routing (reference: config/security.yaml:17-104) ---
INTERNAL_DOMAIN_RE = r"(\.internal\.|\.corp\.|\.intranet\.|localhost)"
PRIVATE_IP_RE = (
    r"(https?://)(127\.|10\.|192\.168\.|172\.(1[6-9]|2[0-9]|3[01])\.)"
)
SENSITIVE_KEYWORD_RE = r"(token=|secret=|api_key=|apikey=|password=)"

# --- obstacle detection (reference: DESIGN.md:798-852) ---
OBSTACLE_MIN_CHARS = 100
OBSTACLE_LOGIN_RE = r"(log in|sign in|login required|authentication required)"
OBSTACLE_CAPTCHA_RE = r"(captcha|recaptcha|are you a robot|unusual traffic)"
OBSTACLE_ANTIBOT_RE = r"(cloudflare|access denied|rate limit|403 forbidden)"

# --- text pipeline (reference: config/limits.yaml:86-95,143-170) ---
MAX_TOTAL_OUTPUT_CHARS = 50_000
# kept newline-free so the identical literal is embeddable in Spark and
# DuckDB SQL (escape-sequence handling differs between the dialects)
TRUNCATE_NOTICE = " [... content truncated ...]"
SUMMARY_MAX_CHARS = 500
CHUNK_CHARS = 10_000  # udtf-chunk-text fixed chunk size
RAG_CHUNK_MIN = 500
RAG_CHUNK_MAX = 1000
RAG_CHUNK_OVERLAP = 100
RAG_CHUNKS_PER_FILE_CAP = 50

# --- strategy thresholds (reference: DESIGN.md:647-724) ---
STRATEGY_DIRECT_MAX = 10_000  # chars: read directly
STRATEGY_CHUNK_MAX = 100_000  # chars: chunked read
# beyond CHUNK_MAX: summary-only
BATCH_MAX_FILES = 5
BATCH_MAX_BYTES = 1_000_000
TRANSFORM_INDEX_ONLY_PAGES = 10  # pages>10 -> index_only
TRANSFORM_SUMMARIZE_PAGES = 5  # pages>5 or chars>30k -> summarize_first
TRANSFORM_SUMMARIZE_CHARS = 30_000

# hot-shingle hygiene (VERDICT r1 #6): shingles present in more than this
# many documents (per block) are boilerplate — dropped before any pairwise
# dedup stage so no single join key fans out past MAX_DF².
DEDUP_SHINGLE_MAX_DF = 100

# --- corpus quality gates (published training-data pipeline rules:
# repetition/top-word caps in the Gopher-rules style, n-gram LM scoring in
# the CCNet style) ---
GOPHER_DUP3_MAX = 0.10  # max fraction of duplicate word-3-grams per doc
GOPHER_TOPWORD_MAX = 0.12  # max share of the single most frequent word
# Unigram-LM vocabulary cap (CCNet-style capped artifact): the LM table
# broadcast to executors holds at most this many (token, count) rows plus
# one OOV bucket carrying the residual mass — NEVER the full raw vocabulary
# (by Heaps' law a 100 TB web corpus has billions of distinct raw tokens;
# an unbounded broadcast OOMs the driver). Production value would be
# ~2^16 like a shipped KenLM vocab; set low enough here to BIND on the
# 31-type synthetic corpus so every differential run exercises the OOV
# path (a cap the tests never hit is an untested cap).
UNIGRAM_VOCAB_TOPK = 24
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20

# link-prediction hub cap: nodes above this degree are excluded from
# common-neighbor candidate generation (a hub of degree d fans the
# neighbor-join out d² — same hygiene as DEDUP_SHINGLE_MAX_DF).
GRAPH_MAX_DEGREE = 1000

# --- streaming state-store profile (round-8 verdict #6) ---------------------
# The r7/r8 A/B series (tools/bench_ssj_state.py, docs/PERF.md, SCALE.md)
# measured both backends on the stream-stream interval join. The call is
# workload- AND deployment-shaped: in ONE big-heap local JVM the HDFS
# provider's on-heap maps win the outer-join flush outright and the inner
# join narrowly loses to RocksDB on honest distinct keys (17.1 vs 19.9 s,
# r8 re-run); on a real cluster — many small executors, state larger than
# any one heap, restart recovery from changelogs — RocksDB is the right
# default. Encode that decision as a PROFILE, not prose:
#   local-jvm : Spark's default HDFSBackedStateStoreProvider, no changelog
#               (what local[32] correctness runs and bench use).
#   cluster   : RocksDB provider + changelog checkpointing (incremental
#               state uploads; restart cost ~ delta, not full snapshot).
# Resolution order: explicit function arg > $SPARK_GRAFT_STATE_PROFILE >
# legacy $SPARK_GRAFT_SSJ_STATE_PROVIDER=rocksdb (maps to "cluster") >
# "local-jvm". The new env var outranks the legacy one so a stale
# pre-r9 provider export cannot silently override an explicit profile.
ROCKSDB_PROVIDER = (  # single source of truth; streaming/stateful re-exports
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
STATE_STORE_PROFILES: dict[str, dict[str, str]] = {
    "local-jvm": {},
    "cluster": {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled": "true",
    },
}


def state_store_conf(profile: str | None = None) -> dict[str, str]:
    """Session conf for the given state-store profile (see
    STATE_STORE_PROFILES). Raises on an unknown profile name so a typo'd
    env var fails loudly instead of silently running the wrong backend."""
    import os as _os

    if profile is None:
        profile = _os.environ.get("SPARK_GRAFT_STATE_PROFILE")
        if profile is None:
            if _os.environ.get("SPARK_GRAFT_SSJ_STATE_PROVIDER") == "rocksdb":
                profile = "cluster"  # legacy knob, lowest env precedence
            else:
                profile = "local-jvm"
    if profile not in STATE_STORE_PROFILES:
        raise ValueError(
            f"unknown state-store profile {profile!r}; "
            f"expected one of {sorted(STATE_STORE_PROFILES)}"
        )
    return dict(STATE_STORE_PROFILES[profile])
