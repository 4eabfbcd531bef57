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
        # vacuum-generation sidecar (see vacuum/_flush_locked): bumped
        # BEFORE the data file is replaced, recorded in the manifest at
        # flush — a manifest whose generation disagrees with the sidecar
        # was flushed against a different data-file layout and is dropped
        self.gen_path = os.path.join(cache_dir,
                                     f"decoded_{self.image_size}.gen")
        self._lock = threading.Lock()
        self._entries: dict[str, dict] = {}
        self._appends_since_flush = 0
        self._retired_fds: list[int] = []
        self._closed = False
        self._generation = self._read_generation()
        size = (os.path.getsize(self.data_path)
                if os.path.exists(self.data_path) else 0)
        if size % self.row_bytes:
            # partial trailing row (crash mid-append): the append handle
            # writes at the TRUE end of file, so without truncation every
            # later put() records a row offset that disagrees with its
            # byte position and get() silently returns misaligned bytes
            size = (size // self.row_bytes) * self.row_bytes
            log.warning("cache data file %s has a partial trailing row; "
                        "truncating to %d bytes", self.data_path, size)
            os.truncate(self.data_path, size)
        if os.path.exists(self.manifest_path):
            # any malformed manifest — bad JSON, wrong schema, entries
            # missing fields — rebuilds rather than crashing construction
            try:
                with open(self.manifest_path) as f:
                    manifest = json.load(f)
                if (manifest.get("image_size") == self.image_size
                        and int(manifest.get("generation", 0))
                        == self._generation):
                    entries = manifest.get("entries", {})
                    self._entries = {
                        k: {"row": int(v["row"]), "sig": list(v["sig"])}
                        for k, v in entries.items()}
                elif manifest.get("image_size") == self.image_size:
                    log.warning(
                        "cache manifest %s is generation %s but sidecar "
                        "says %d (crash mid-vacuum); rebuilding",
                        self.manifest_path, manifest.get("generation", 0),
                        self._generation)
            except Exception as e:
                self._entries = {}
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

    def _read_generation(self) -> int:
        try:
            with open(self.gen_path) as f:
                return int(f.read().strip())
        except Exception:
            return 0

    def _write_generation(self, gen: int) -> None:
        tmp = self.gen_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(gen))
        os.replace(tmp, self.gen_path)

    @staticmethod
    def _sig(path: str) -> list[int] | None:
        try:
            st = os.stat(path)
            return [st.st_mtime_ns, st.st_size]
        except OSError:
            return None

    def get(self, path: str) -> np.ndarray | None:
        """Cached [S, S, 3] uint8 row for ``path``, or None on miss/stale.

        Thread-safe against a concurrent ``vacuum()``: the (fd, row) pair
        is captured atomically under the lock — vacuum renumbers rows and
        swaps the read fd together under the same lock, and RETIRES the
        old fd instead of closing it, so a pread on a captured pre-vacuum
        pair still reads the old inode's bytes (identical content) rather
        than mixing an old row number with the new layout."""
        key = os.path.abspath(path)
        sig = self._sig(key)
        with self._lock:
            entry = self._entries.get(key)
            if entry is None or entry["sig"] != sig:
                self.misses += 1
                return None
            fd = self._read_fd
            offset = entry["row"] * self.row_bytes
        buf = os.pread(fd, self.row_bytes, offset)
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
                       # generation marker (see __init__/vacuum): a
                       # manifest whose generation disagrees with the
                       # sidecar was flushed against a different data-file
                       # layout — drop it at open
                       "generation": self._generation,
                       "entries": self._entries}, f)
        os.replace(tmp, self.manifest_path)
        self._appends_since_flush = 0

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def close(self) -> None:
        """Flush + close; idempotent (a with-block after an explicit close
        must not re-flush a closed writer or double-close fds)."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._flush_locked()
            self._append_f.close()
            os.close(self._read_fd)
            for fd in self._retired_fds:
                try:
                    os.close(fd)
                except OSError:  # pragma: no cover
                    pass
            self._retired_fds.clear()

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
        usable on its original fds/layout, and a crash anywhere between the
        generation bump and the manifest flush is caught at next open by
        the sidecar generation check — stale manifests are dropped rather
        than serving wrong rows by stale numbering (the sidecar is bumped
        BEFORE the data file is replaced, so every crash window leaves
        manifest.generation ≠ sidecar).  Concurrent ``get()`` calls stay
        correct throughout: the old read fd is RETIRED, not closed (see
        get), and rows/fd swap atomically under the lock."""
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
            # bump sidecar generation → replace data → open new fds →
            # swap → renumber → retire old read fd.  The sidecar bump
            # comes FIRST: from that point until the manifest flush at the
            # end, the on-disk manifest's generation disagrees with the
            # sidecar, so a crash in ANY window rebuilds instead of
            # serving rows by stale numbering (unflushed appends can make
            # the compacted file as large as the old one, so a size check
            # alone cannot catch this — found in review).
            new_gen = self._generation + 1
            try:
                self._write_generation(new_gen)
            except OSError:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                raise
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
            self._generation = new_gen
            old_append.close()
            # retire (don't close) the old read fd: a concurrent get()
            # may have captured it just before this swap — the old inode
            # stays readable through it until close()
            self._retired_fds.append(old_read)
            self._flush_locked()
