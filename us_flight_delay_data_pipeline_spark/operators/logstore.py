"""Log-store seam for the txlog ACID layer (operators/txlog.py).

The ONLY filesystem semantics the transaction-log protocol needs are:

- ``list()``     — names of committed log objects (manifests,
                   checkpoints); S3 ListObjectsV2 is strongly
                   consistent since 2020, so listing is a valid way
                   to discover the latest version on every backend.
- ``read(name)`` — full contents of one log object.
- ``put_if_absent(name, content)`` — atomically create ``name`` with
                   ``content`` iff it does not exist; return False if
                   it does. This single primitive carries the whole
                   optimistic-concurrency story: two writers racing
                   for version N both call put_if_absent(N.json),
                   exactly one wins.

Two implementations:

- :class:`PosixLogStore` — stage to a temp file + ``os.link`` (atomic
  create-if-absent with content on POSIX and HDFS-style stores).
  This is the behavior txlog has always had, now behind the seam.
- :class:`ObjectStoreLogStore` — rename-less, link-less object-store
  semantics: put_if_absent is a conditional PUT (S3
  ``If-None-Match: *``, GCS ``x-goog-if-generation-match: 0``, Azure
  ``If-None-Match: *`` — all public, all natively supported). The
  default client is :class:`InMemoryObjectStore`, a faithful fake for
  tests; swapping in a real boto3-backed client is a constructor
  argument, not a protocol change.

Data directories are NOT behind this seam on purpose: parquet data is
written by Spark's own committers (which handle object stores via the
cloud committers), and the txlog protocol never renames or links data
dirs — dirs are immutable once a manifest references them, so plain
PUTs suffice. The manifest publish is the one place where
create-if-absent atomicity is load-bearing.
"""

from __future__ import annotations

import os
import tempfile
import threading

__all__ = ["PosixLogStore", "ObjectStoreLogStore", "InMemoryObjectStore"]


class PosixLogStore:
    """Log objects are files in ``log_dir``; conditional create is
    tmp-file + ``os.link`` (atomic, fails-if-exists, content complete
    at publish time)."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)

    def list(self) -> list[str]:
        return sorted(os.listdir(self.log_dir))

    def read(self, name: str) -> str:
        with open(os.path.join(self.log_dir, name)) as f:
            return f.read()

    def put_if_absent(self, name: str, content: str) -> bool:
        final = os.path.join(self.log_dir, name)
        fd, tmp = tempfile.mkstemp(dir=self.log_dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(content)
            try:
                os.link(tmp, final)
                return True
            except FileExistsError:
                return False
        finally:
            os.unlink(tmp)


class InMemoryObjectStore:
    """Faithful fake of an S3-style bucket for the log-store tests:
    flat keyspace, strongly consistent LIST (matching S3 since 2020),
    and a conditional PUT that atomically fails when the key exists
    (``If-None-Match: *`` semantics). Thread-safe so concurrency
    tests can race real threads against it."""

    def __init__(self):
        self._objects: dict[str, str] = {}
        self._lock = threading.Lock()

    def list_keys(self, prefix: str) -> list[str]:
        with self._lock:
            return sorted(k for k in self._objects if k.startswith(prefix))

    def get(self, key: str) -> str:
        with self._lock:
            return self._objects[key]

    def put_if_none_match(self, key: str, content: str) -> bool:
        with self._lock:
            if key in self._objects:
                return False  # 412 PreconditionFailed
            self._objects[key] = content
            return True


class ObjectStoreLogStore:
    """Rename-less, link-less log store over a conditional-PUT object
    client (the documented S3-semantics publish path,
    txlog docstring). ``client`` needs three methods —
    ``list_keys(prefix)``, ``get(key)``, ``put_if_none_match(key,
    content) -> bool`` — which map 1:1 onto S3 ListObjectsV2 / GetObject
    / PutObject-with-If-None-Match."""

    def __init__(self, client, prefix: str):
        self.client = client
        self.prefix = prefix.rstrip("/") + "/"

    def list(self) -> list[str]:
        n = len(self.prefix)
        return [k[n:] for k in self.client.list_keys(self.prefix)]

    def read(self, name: str) -> str:
        return self.client.get(self.prefix + name)

    def put_if_absent(self, name: str, content: str) -> bool:
        return self.client.put_if_none_match(self.prefix + name, content)
