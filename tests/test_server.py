"""Retrieval HTTP server tests: real socket requests against a live server."""

import json
import urllib.request
import urllib.error

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from patent_tpu.data import synthetic
from patent_tpu.models.vit import VisionConfig, VisionTransformer
from patent_tpu.retrieval import RetrievalEngine
from patent_tpu.retrieval.server import serve


@pytest.fixture(scope="module")
def live_server(tmp_path_factory):
    root = tmp_path_factory.mktemp("srv")
    records, images_dir = synthetic.write_synthetic_corpus(
        str(root), num_patents=5, figures_per_patent=3, image_size=32)
    vc = VisionConfig(image_size=32, patch_size=8, hidden_dim=32, num_layers=1,
                      num_heads=4, mlp_dim=64, projection_dim=16)
    model = VisionTransformer(vc)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    apply_jit = jax.jit(model.apply)
    engine = RetrievalEngine(lambda b: apply_jit(params, b), batch_size=4,
                             image_size=32, num_workers=2)
    import os

    paths = sorted(os.path.join(images_dir, f) for f in os.listdir(images_dir))
    engine.encode_dataset(paths)
    server = serve(engine, port=0, block=False,   # ephemeral port
                   data_root=images_dir)
    host, port = server.server_address
    yield f"http://{host}:{port}", engine, paths
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz_and_stats(live_server):
    base, engine, _ = live_server
    status, body = _get(base + "/healthz")
    assert status == 200 and body["status"] == "ok"
    assert body["gallery_size"] == len(engine.index)
    status, stats = _get(base + "/stats")
    assert status == 200 and stats["similarity"] == "cosine"


def test_search_by_features(live_server):
    base, engine, _ = live_server
    q = np.asarray(engine.index.embeddings[0])
    status, body = _post(base + "/search", {"features": q.tolist(), "k": 3})
    assert status == 200
    results = body["results"][0]
    assert len(results) == 3
    # nearest neighbor of an indexed vector is itself
    import os

    assert results[0]["name"] == os.path.basename(engine.index.names[0])
    assert results[0]["score"] == pytest.approx(1.0, abs=1e-4)


def test_search_by_image_path(live_server):
    base, _engine, paths = live_server
    status, body = _post(base + "/search", {"image_path": paths[0], "k": 2})
    assert status == 200
    assert len(body["results"][0]) == 2
    # relative paths resolve against data_root
    import os

    status, body = _post(base + "/search",
                         {"image_path": os.path.basename(paths[0]), "k": 2})
    assert status == 200


def test_image_path_disabled_without_data_root():
    """With no data_root the image_path mode is off regardless of payload."""
    from patent_tpu.retrieval.server import RetrievalService

    class _FakeIndex:
        def __len__(self):
            return 1

    class _FakeEngine:
        index = _FakeIndex()

    svc = RetrievalService(_FakeEngine())
    out = svc.search({"image_path": "/etc/hostname"})
    assert out["_status"] == 400 and "unavailable" in out["error"]


def test_search_by_name_and_errors(live_server):
    base, engine, _ = live_server
    import os

    name = engine.index.names[1]
    status, body = _post(base + "/search", {"name": name, "k": 2})
    assert status == 200
    assert body["results"][0][0]["name"] == os.path.basename(name)
    # unknown name → 404
    status, body = _post(base + "/search", {"name": "nope.png"})
    assert status == 404 and "unknown gallery item" in body["error"]
    # missing file → 400
    status, body = _post(base + "/search", {"image_path": "/no/such.png"})
    assert status == 400
    missing_err = body["error"]
    # containment: a file that EXISTS outside data_root is refused with the
    # SAME error as a missing one (no existence oracle)
    status, body = _post(base + "/search",
                         {"image_path": "../../../../etc/hostname"})
    assert status == 400 and body["error"] == missing_err
    status, body = _post(base + "/search", {"image_path": "/etc/hostname"})
    assert status == 400 and body["error"] == missing_err
    # empty body → 400
    status, body = _post(base + "/search", {})
    assert status == 400
    # garbage JSON → 400
    req = urllib.request.Request(base + "/search", data=b"not json",
                                 method="POST")
    try:
        urllib.request.urlopen(req, timeout=30)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised
    # unknown endpoint → 404
    status, _ = _get(base + "/healthz")  # still alive after the error barrage
    assert status == 200
