"""Decoded-u8 image cache: one decode, many encode passes.

The composed encode-from-disk path is decode-bound on small hosts (the
native PNG decoder measures 583 img/s/core; PIL is slower), yet the
framework's own workloads re-read the SAME gallery repeatedly: the golden
pipeline encodes one gallery under bf16, int8, and pruned towers (three
full decode passes), `eval` re-encodes the query set per battery, and any
re-index starts from the same files.  The reference pays this cost every
pass too (DataLoader re-decodes per epoch/run,
/root/reference/notebooks/retrieval.ipynb cell 2).

This cache stores post-resize raw RGB rows — [S, S, 3] uint8, ~147 KB at
224px — in ONE append-only flat file with a JSON manifest keyed by
absolute path and (mtime_ns, size) signature.  A second pass streams rows
with ``os.pread`` at page-cache/disk bandwidth (measured: thousands of
img/s vs hundreds for decode), turning every later pass device- or
wire-bound.  u8 is also the serving wire format, so cached rows feed the
device path with zero further host work.

Design notes:
* Append-only + single flat file: no per-image-file inode storm; rows are
  written under a lock by whichever decode thread misses, and the manifest
  is flushed at close (and every 512 appends, so a crash loses bounded
  work, never correctness — unflushed rows are simply re-decoded).
* Validation is per-source-file (mtime_ns, size): a changed image gets
  re-decoded and re-appended; the stale row becomes dead space (galleries
  are immutable in practice; ``vacuum()`` rewrites the file when callers
  care).
* Single-process writer assumed (the CLI actions run one at a time); reads
  are positional pread and safe from any thread.
"""

from __future__ import annotations

import json
import logging
import os
import threading

import numpy as np

log = logging.getLogger(__name__)

_MANIFEST_FLUSH_EVERY = 512


class DecodedU8Cache:
    """Append-only decoded-u8 row cache (see module docstring).

    Usage::

        cache = DecodedU8Cache(cache_dir, image_size=224)
        arr = cache.get(path)            # None on miss
        cache.put(path, decoded_u8)      # [S, S, 3] uint8
        cache.close()                    # flush manifest
    """

    def __init__(self, cache_dir: str, image_size: int):
        self.image_size = int(image_size)
        self.row_bytes = self.image_size * self.image_size * 3
        os.makedirs(cache_dir, exist_ok=True)
        self.data_path = os.path.join(cache_dir,
                                      f"decoded_{self.image_size}.u8")
        self.manifest_path = os.path.join(
            cache_dir, f"decoded_{self.image_size}.json")
        self._lock = threading.Lock()
        self._entries: dict[str, dict] = {}
        self._appends_since_flush = 0
        size = (os.path.getsize(self.data_path)
                if os.path.exists(self.data_path) else 0)
        if os.path.exists(self.manifest_path):
            try:
                with open(self.manifest_path) as f:
                    manifest = json.load(f)
                if manifest.get("image_size") == self.image_size:
                    # generation check: the manifest records the data-file
                    # size it was flushed against.  Appends after a flush
                    # only GROW the file, so actual < recorded means the
                    # manifest describes a different (pre-vacuum) layout —
                    # e.g. a crash between vacuum()'s data-file replace
                    # and its manifest flush.  Serving rows by the stale
                    # numbering would return WRONG images (the signature
                    # validates the source path, not the row content);
                    # dropping the entries is always safe (re-decode).
                    recorded = manifest.get("data_bytes")
                    if recorded is not None and size < recorded:
                        log.warning(
                            "cache manifest %s describes %d data bytes but "
                            "file has %d (stale generation); rebuilding",
                            self.manifest_path, recorded, size)
                    else:
                        self._entries = manifest.get("entries", {})
            except (json.JSONDecodeError, OSError) as e:
                log.warning("unreadable cache manifest %s (%s); rebuilding",
                            self.manifest_path, e)
        # rows beyond the manifest (crash between append and flush) are
        # dead space; n_rows tracks the FILE so new appends land past them
        self._n_rows = size // self.row_bytes
        # drop manifest entries pointing past a truncated file
        self._entries = {k: v for k, v in self._entries.items()
                         if v["row"] < self._n_rows}
        self._append_f = open(self.data_path, "ab")
        self._read_fd = os.open(self.data_path, os.O_RDONLY)
        self.hits = 0
        self.misses = 0

    @staticmethod
    def _sig(path: str) -> list[int] | None:
        try:
            st = os.stat(path)
            return [st.st_mtime_ns, st.st_size]
        except OSError:
            return None

    def get(self, path: str) -> np.ndarray | None:
        """Cached [S, S, 3] uint8 row for ``path``, or None on miss/stale."""
        key = os.path.abspath(path)
        entry = self._entries.get(key)
        if entry is None or entry["sig"] != self._sig(key):
            with self._lock:
                self.misses += 1
            return None
        buf = os.pread(self._read_fd, self.row_bytes,
                       entry["row"] * self.row_bytes)
        if len(buf) != self.row_bytes:      # truncated file: treat as miss
            with self._lock:
                self.misses += 1
            return None
        with self._lock:
            self.hits += 1
        return np.frombuffer(buf, np.uint8).reshape(
            self.image_size, self.image_size, 3)

    def put(self, path: str, arr: np.ndarray) -> None:
        """Append a decoded row (thread-safe; last writer wins per path)."""
        if arr.shape != (self.image_size, self.image_size, 3) \
                or arr.dtype != np.uint8:
            raise ValueError(f"expected [{self.image_size}, "
                             f"{self.image_size}, 3] uint8, got "
                             f"{arr.shape} {arr.dtype}")
        key = os.path.abspath(path)
        sig = self._sig(key)
        if sig is None:
            return
        data = np.ascontiguousarray(arr).tobytes()
        with self._lock:
            self._append_f.write(data)
            row = self._n_rows
            self._n_rows += 1
            self._entries[key] = {"row": row, "sig": sig}
            self._appends_since_flush += 1
            if self._appends_since_flush >= _MANIFEST_FLUSH_EVERY:
                self._flush_locked()

    def _flush_locked(self) -> None:
        self._append_f.flush()
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"image_size": self.image_size,
                       # generation marker (see __init__): actual file
                       # size < this at load ⇒ the manifest is from a
                       # different data-file generation — drop it
                       "data_bytes": self._n_rows * self.row_bytes,
                       "entries": self._entries}, f)
        os.replace(tmp, self.manifest_path)
        self._appends_since_flush = 0

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def close(self) -> None:
        with self._lock:
            self._flush_locked()
            self._append_f.close()
            os.close(self._read_fd)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __len__(self) -> int:
        return len(self._entries)

    def vacuum(self) -> None:
        """Rewrite the data file keeping only live rows (reclaims dead
        space left by re-decoded/stale entries).

        Failure contract: a truncated row (data file inconsistent with the
        manifest, e.g. external truncation) raises ``RuntimeError`` and
        leaves the cache object fully USABLE — the tmp file is removed, no
        manifest entry or fd is touched, and later get/put calls keep
        operating on the original data file (rows past the truncation
        simply miss via the short-read guard in ``get``).  Commit-phase
        failures (ENOSPC on the replace, fd reopen) also leave the object
        usable on its original fds/layout, and a crash between the
        data-file replace and the manifest flush is caught at next open by
        the ``data_bytes`` generation check — stale manifests are dropped
        rather than serving wrong rows."""
        with self._lock:
            # recent put()s may still sit in the BufferedWriter (manifest
            # flush is every _MANIFEST_FLUSH_EVERY appends); pread on the
            # separate read fd cannot see them, and copying a short row
            # would misalign every row after it — flush first, and treat a
            # short read as corruption rather than writing it through
            self._append_f.flush()
            live = sorted(self._entries.items(), key=lambda kv: kv[1]["row"])
            tmp = self.data_path + ".tmp"
            try:
                with open(tmp, "wb") as out:
                    for key, entry in live:
                        buf = os.pread(self._read_fd, self.row_bytes,
                                       entry["row"] * self.row_bytes)
                        if len(buf) != self.row_bytes:
                            raise RuntimeError(
                                f"cache row for {key} truncated "
                                f"({len(buf)} of {self.row_bytes} bytes); "
                                "data file inconsistent with manifest")
                        out.write(buf)
            except Exception:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                raise
            # commit, ordered so a failure at ANY step leaves the object
            # usable on the OLD layout (fds keep the old inode alive even
            # after the on-disk replace; entries are renumbered last):
            # replace → open new fds → swap → renumber → close old.
            # A crash between the replace and the manifest flush is caught
            # at next open by the data_bytes generation check (__init__).
            try:
                os.replace(tmp, self.data_path)
            except OSError:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                raise
            try:
                new_append = open(self.data_path, "ab")
                new_read = os.open(self.data_path, os.O_RDONLY)
            except OSError:
                # on-disk file is compacted but this object stays on the
                # old inode via its open fds — degraded (appends invisible
                # to later opens) yet consistent; next open re-decodes
                raise
            old_append, old_read = self._append_f, self._read_fd
            self._append_f, self._read_fd = new_append, new_read
            for i, (_key, entry) in enumerate(live):
                entry["row"] = i
            self._n_rows = len(live)
            old_append.close()
            os.close(old_read)
            self._flush_locked()
