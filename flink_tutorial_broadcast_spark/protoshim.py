"""Activate the vendored mini protobuf runtime when the real wheel is
absent, for BOTH the driver process and Spark's Python workers.

``transformWithStateInPandas`` (SURVEY §2.E7) talks to the JVM state
server through generated protobuf messages
(pyspark/sql/streaming/proto/StateMessage_pb2.py). This container ships
no protobuf wheel, so that import fails inside the Python WORKER at
state-access time. The vendor tree under
``flink_tutorial_broadcast_spark/vendor`` provides a minimal
wire-compatible runtime (vendor/google/protobuf/_mini.py); this module
wires it up:

- driver side: prepend the vendor dir to ``sys.path`` (only if
  ``google.protobuf`` is not already importable — a real install always
  wins);
- worker side: merge the vendor dir into
  ``sc.environment["PYTHONPATH"]``. Worker daemons receive that map as
  env vars and Spark merges its PYTHONPATH entry into the daemon's
  ``sys.path`` at daemon start; a changed env map keys a fresh daemon,
  so activation works even on an already-running session.
"""

from __future__ import annotations

import importlib.util
import os
import sys

VENDOR_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "vendor")


def has_real_protobuf() -> bool:
    """True iff a google.protobuf import would resolve OUTSIDE the
    vendor tree (i.e. the real wheel is installed)."""
    try:
        spec = importlib.util.find_spec("google.protobuf")
    except ModuleNotFoundError:  # no `google` namespace at all
        return False
    return spec is not None and VENDOR_DIR not in (spec.origin or "")


def ensure_protoshim(spark=None) -> str:
    """Make ``google.protobuf`` importable here and in Python workers.
    Returns "real" if the genuine package is installed (no-op), else
    "mini" after activating the vendored runtime."""
    if has_real_protobuf():
        return "real"
    if VENDOR_DIR not in sys.path:
        sys.path.insert(0, VENDOR_DIR)
    # keep subprocess-launched sessions covered too
    cur = os.environ.get("PYTHONPATH", "")
    if VENDOR_DIR not in cur.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            VENDOR_DIR + (os.pathsep + cur if cur else ""))
    if spark is not None:
        env = spark.sparkContext.environment
        wcur = env.get("PYTHONPATH", "")
        if VENDOR_DIR not in wcur.split(os.pathsep):
            env["PYTHONPATH"] = (
                VENDOR_DIR + (os.pathsep + wcur if wcur else ""))
    return "mini"
