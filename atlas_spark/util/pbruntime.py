"""Locate a usable ``google.protobuf`` runtime for Spark 4's
``transformWithStateInPandas`` state-server protocol.

The TWS Python workers (the schema-inference "driver worker" spawned by
``StreamingPythonRunner`` and the executor-side state-server clients)
import ``pyspark.sql.streaming.proto.StateMessage_pb2``, whose gencode
needs the ``google.protobuf`` runtime.  pip installs are not always
possible, but many hosts carry a vendored pure-Python protobuf runtime
(e.g. the google-cloud-sdk app-engine platform tree).  This helper

1. finds one (normal import first, then known vendored locations, then
   the ``ATLAS_PROTOBUF_RUNTIME`` env override),
2. exposes it through a shim directory containing ONLY the PEP-420
   namespace path ``google/protobuf`` (a symlink — never the rest of the
   vendor tree, which may shadow unrelated packages), and
3. exports ``PYTHONPATH`` (plus the protobuf gencode/runtime
   version-check override when runtime < gencode within the same major)
   so that Python workers spawned by the JVM inherit it.

Ordering constraint: JVM-spawned workers inherit the JVM's environment,
captured at JVM launch — so :func:`ensure_protobuf_runtime` must run
BEFORE the first ``SparkSession`` of the process (``session.get_spark``
calls it).  :func:`jvm_inherits_runtime` checks whether a live session's
JVM was launched with the exports, which is what decides whether the
TWS path is actually usable (streaming/stateful.py::
``supports_transform_with_state``).
"""

from __future__ import annotations

import importlib
import os
import sys
import tempfile

_DISABLE_FLAG = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"

# outcome memo: None = not probed, else (ok, shim_path_or_None, used_flag)
_state: "tuple[bool, str | None, bool] | None" = None


def _candidate_vendor_dirs() -> "list[str]":
    """Directories that may contain a vendored ``google/protobuf``."""
    cands = []
    env = os.environ.get("ATLAS_PROTOBUF_RUNTIME")
    if env:
        cands.append(env)
    cands.append("/usr/lib/google-cloud-sdk/platform/google_appengine")
    # resolve relative to a gcloud on PATH (covers non-/usr/lib installs)
    try:
        from shutil import which

        gcloud = which("gcloud")
        if gcloud:
            sdk = os.path.dirname(os.path.dirname(os.path.realpath(gcloud)))
            cands.append(os.path.join(sdk, "platform", "google_appengine"))
    except Exception:
        pass
    return cands


def _gencode_import_ok() -> bool:
    """Can the pyspark TWS gencode be imported right now?"""
    try:
        importlib.invalidate_caches()
        importlib.import_module("pyspark.sql.streaming.proto.StateMessage_pb2")
        return True
    except Exception:
        return False


def _try_with_version_flag() -> bool:
    """Retry the gencode import with the protobuf version check relaxed
    (runtime older than gencode within the same major — e.g. vendored
    6.32 runtime vs pyspark's 6.33 gencode).  Sets the flag in
    ``os.environ`` so spawned workers inherit it too."""
    if _gencode_import_ok():
        return True
    os.environ[_DISABLE_FLAG] = "true"
    # the flag is read at pb2 module import; drop a failed partial import
    sys.modules.pop("pyspark.sql.streaming.proto.StateMessage_pb2", None)
    return _gencode_import_ok()


def ensure_protobuf_runtime() -> bool:
    """Make ``google.protobuf`` importable in this process AND by
    Python workers of a SparkSession created after this call.  Returns
    True when the TWS state-server gencode imports cleanly."""
    global _state
    if _state is not None:
        return _state[0]

    # 1. a real install
    try:
        importlib.import_module("google.protobuf.descriptor")
        ok = _try_with_version_flag()
        _state = (ok, None, _DISABLE_FLAG in os.environ)
        return ok
    except ImportError:
        pass

    # 2. a vendored runtime, exposed through an isolated shim
    for vendor in _candidate_vendor_dirs():
        pb = os.path.join(vendor, "google", "protobuf")
        if not os.path.isfile(os.path.join(pb, "descriptor.py")):
            continue
        shim = os.path.join(
            tempfile.gettempdir(), f"atlas_pbshim_{os.getuid()}"
        )
        link = os.path.join(shim, "google", "protobuf")
        try:
            os.makedirs(os.path.join(shim, "google"), exist_ok=True)
            if not os.path.islink(link):
                os.symlink(pb, link)
            elif os.path.realpath(link) != os.path.realpath(pb):
                os.remove(link)
                os.symlink(pb, link)
        except OSError:
            continue
        if shim not in sys.path:
            sys.path.insert(0, shim)
        prev = os.environ.get("PYTHONPATH", "")
        if shim not in prev.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                shim + (os.pathsep + prev if prev else "")
            )
        if _try_with_version_flag():
            _state = (True, shim, _DISABLE_FLAG in os.environ)
            return True
        # undo a non-working shim so the next candidate starts clean
        sys.path.remove(shim)

    _state = (False, None, False)
    return False


def jvm_inherits_runtime(spark) -> bool:
    """True when ``spark``'s JVM was launched with the exports workers
    need — i.e. TWS worker processes spawned by this session will find
    the protobuf runtime.  Call :func:`ensure_protobuf_runtime` first."""
    if _state is None or not _state[0]:
        return False
    ok, shim, used_flag = _state
    try:
        getenv = spark.sparkContext._jvm.java.lang.System.getenv
        if shim is not None:
            jvm_pp = getenv("PYTHONPATH") or ""
            if shim not in jvm_pp.split(os.pathsep):
                return False
        if used_flag and not getenv(_DISABLE_FLAG):
            return False
        return True
    except Exception:
        return False
