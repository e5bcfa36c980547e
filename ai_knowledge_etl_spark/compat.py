"""Environment compatibility shims.

ensure_protobuf(): Spark 4.1's transformWithStateInPandas state protocol
needs `google.protobuf` (>=5.27: its generated StateMessage_pb2 imports
google.protobuf.runtime_version, added in 5.27) in the DRIVER, the
pre-init streaming runner, and every Python WORKER. The container has no
pip-installed protobuf and no network, but it DOES ship a pure-Python
protobuf 6.32 inside the (public) google-cloud-sdk App Engine platform
directory. This shim:

  1. appends that directory to sys.path (driver-side import),
  2. appends it to $PYTHONPATH so the JVM — and therefore the TWS
     pre-init runner and the Python workers it spawns — inherits it
     (must run BEFORE SparkSession creation; worker processes get their
     environment from the JVM). Appended, not prepended, for the same
     never-shadow rationale as the sys.path edit: the App Engine
     platform dir ships many top-level packages beyond protobuf, and
     putting it FIRST would let those shadow same-named modules in
     every spawned worker; last, it only supplies what is otherwise
     missing (protobuf resolves fine from the tail — `google` is a
     namespace package, so its path entries merge),
  3. sets protobuf's own documented escape hatch
     TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK for the one-minor-behind
     runtime (Spark's gencode is 6.33, the on-disk runtime 6.32; the
     wire format is identical, only the strict >=gencode check trips).

On a real cluster none of this fires: `import google.protobuf` succeeds
and the function is a no-op returning True. Verified end-to-end in this
container: running_user_stats via transformWithStateInPandas on the
RocksDB provider converges to the batch answer (tests/test_streaming.py
::test_transform_with_state_running_stats, un-skipped by this shim).
"""

from __future__ import annotations

import os
import sys

# Public google-cloud-sdk App Engine platform layout; probed, never required.
_FALLBACK_DIRS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def ensure_protobuf() -> bool:
    """Make `google.protobuf` importable here and in spawned workers if at
    all possible. Returns availability; never raises."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    for d in _FALLBACK_DIRS:
        if not os.path.isdir(os.path.join(d, "google", "protobuf")):
            continue
        if d not in sys.path:
            sys.path.append(d)  # append: never shadow real packages
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            sys.path.remove(d)
            continue
        # Propagate to the JVM's children (TWS pre-init runner + workers).
        # APPEND — mirror the sys.path rationale above: workers only need
        # protobuf importable, not first; the platform dir must never
        # shadow same-named modules already on PYTHONPATH.
        prev = os.environ.get("PYTHONPATH", "")
        if d not in prev.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                f"{prev}{os.pathsep}{d}" if prev else d
            )
        # protobuf's own documented override for the gencode>runtime
        # minor-version check (6.33 gencode on the 6.32 on-disk runtime).
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )
        return True
    return False
