"""Retrieval HTTP server — production serving for the index.

The reference's "serving" layer is a notebook cell (retrieval.ipynb cells
2-3); this is the framework's deployable equivalent: a threaded stdlib HTTP
server over a ``RetrievalEngine``/``EmbeddingIndex``.

Endpoints:
  GET  /healthz           → {"status": "ok", "gallery_size": N}
  GET  /stats             → index + engine configuration
  POST /search            → body {"features": [[...]] | "image_path": str,
                                  "k": int}  → ranked [{name, score}] lists
  POST /search_by_name    → body {"name": gallery item, "k": int}
                            (query by an already-indexed item)

Single-writer device access: TPU dispatch happens on the handler thread
under a lock — concurrency comes from pipelining decode (threaded) against
device search, not from concurrent device calls.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class RetrievalService:
    """The request-serving core (separate from HTTP so it is testable).

    ``data_root`` bounds the filesystem surface of the ``image_path`` search
    mode: only files under this directory (after symlink resolution) may be
    read.  With ``data_root=None`` the mode is disabled entirely — a server
    reachable beyond localhost must never be an arbitrary-file-read oracle.
    """

    def __init__(self, engine, data_root: str | None = None):
        self.engine = engine
        self.data_root = (os.path.realpath(data_root)
                          if data_root is not None else None)
        self._device_lock = threading.Lock()
        if engine.index is None:
            raise ValueError("engine has no index; encode_dataset first")

    def _resolve_image_path(self, path: str) -> str | None:
        """realpath-prefix containment check; None = denied or missing.
        Denied and missing return the SAME caller-visible error so the
        endpoint cannot be used to probe for file existence."""
        if self.data_root is None:
            return None
        real = os.path.realpath(os.path.join(self.data_root, path))
        if not (real == self.data_root
                or real.startswith(self.data_root + os.sep)):
            return None
        return real if os.path.isfile(real) else None

    def healthz(self) -> dict:
        return {"status": "ok", "gallery_size": len(self.engine.index)}

    def stats(self) -> dict:
        idx = self.engine.index
        return {
            "gallery_size": len(idx),
            "dim": int(idx.embeddings.shape[1]),
            "similarity": idx.similarity,
            "curvature": idx.c,
            "sharded": idx.mesh is not None,
            "batch_size": self.engine.batch_size,
            "image_size": self.engine.image_size,
        }

    def search(self, payload: dict) -> dict:
        k = int(payload.get("k", 10))
        with self._device_lock:
            if "features" in payload:
                feats = np.asarray(payload["features"], np.float32)
                if feats.ndim == 1:
                    feats = feats[None]
                results = self.engine.index.search_names(feats, k=k)
            elif "image_path" in payload:
                real = self._resolve_image_path(str(payload["image_path"]))
                if real is None:
                    return {"error": "image_path unavailable (must name an "
                                     "existing file under the configured "
                                     "data root)", "_status": 400}
                results = [self.engine.retrieve_similar_images(real, k=k)]
            elif "name" in payload:
                try:
                    row = self.engine.index.names.index(payload["name"])
                except ValueError:
                    return {"error": f"unknown gallery item: {payload['name']}",
                            "_status": 404}
                q = np.asarray(self.engine.index.embeddings[row])[None]
                results = self.engine.index.search_names(q, k=k)
            else:
                return {"error": "body needs 'features', 'image_path' or "
                                 "'name'", "_status": 400}
        return {"results": [[{"name": os.path.basename(n), "score": s}
                             for n, s in row] for row in results]}


class _Handler(BaseHTTPRequestHandler):
    service: RetrievalService = None  # set by serve()

    def _send(self, obj: dict, status: int = 200):
        body = json.dumps(obj).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            self._send(self.service.healthz())
        elif self.path == "/stats":
            self._send(self.service.stats())
        else:
            self._send({"error": "unknown endpoint"}, 404)

    def do_POST(self):
        if self.path not in ("/search", "/search_by_name"):
            self._send({"error": "unknown endpoint"}, 404)
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(length) or b"{}")
        except (ValueError, json.JSONDecodeError) as e:
            self._send({"error": f"bad JSON body: {e}"}, 400)
            return
        out = self.service.search(payload)
        status = out.pop("_status", 200)
        self._send(out, status)

    def log_message(self, fmt, *args):  # quiet by default
        pass


def serve(engine, host: str = "127.0.0.1", port: int = 8777,
          block: bool = True,
          data_root: str | None = None) -> ThreadingHTTPServer:
    """Start the retrieval server; returns the server object (non-blocking
    mode runs it on a daemon thread).  ``data_root`` opts in to the
    image_path search mode, restricted to that directory (see
    RetrievalService)."""
    service = RetrievalService(engine, data_root=data_root)
    handler = type("BoundHandler", (_Handler,), {"service": service})
    server = ThreadingHTTPServer((host, port), handler)
    if block:
        print(f"[patent_tpu] serving retrieval on http://{host}:{port}")
        server.serve_forever()
    else:
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
    return server
