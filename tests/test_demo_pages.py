"""The static demo UI (service/demo/*, the live counterpart of the
reference's Video-engine-web mock pages) serves over GET /demo and each
page's route round-trips over the same server."""

import json
import urllib.request
import urllib.error

import pytest

from cross_modal_video_engine_tpu.service.app import (DEMO_DIR,
                                                      EngineService,
                                                      serve_in_thread)

PAGES = ["index.html", "retrieval.html", "composed_retrieval.html",
         "caption.html", "explainable.html"]


@pytest.fixture(scope="module")
def demo_server():
    service = EngineService()
    service.register("retrieval", lambda p: {
        "results": [{"video": "v1.mp4", "score": 0.9}][: p.get("topK", 1)]})
    service.register("composed_retrieval",
                     lambda p: {"results": ["v2.mp4"]})
    service.register("caption", lambda p: {"steps": [[1, 2], []]})
    service.register("explain", lambda p: {
        "prediction": "archery", "scores": [0.7],
        "object_top": [{"concept": "bow", "score": 0.8}]})
    server, thread = serve_in_thread(service, port=0, demo_dir=DEMO_DIR)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def _post(url, payload):
    req = urllib.request.Request(
        url, json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


@pytest.mark.parametrize("page", PAGES)
def test_demo_page_serves(demo_server, page):
    status, ctype, body = _get(f"{demo_server}/demo/{page}")
    assert status == 200 and "text/html" in ctype
    text = body.decode()
    assert "<form" in text or page == "index.html"
    # every page loads the shared assets and links its siblings
    if page != "index.html":
        assert 'demo.css' in text and 'demo.js' in text


def test_demo_root_and_assets(demo_server):
    status, ctype, _ = _get(f"{demo_server}/demo")
    assert status == 200 and "text/html" in ctype
    # relative links resolve from the root too
    status, ctype, _ = _get(f"{demo_server}/demo.css")
    assert status == 200 and "text/css" in ctype
    status, ctype, _ = _get(f"{demo_server}/demo/demo.js")
    assert status == 200 and "javascript" in ctype


def test_demo_traversal_rejected(demo_server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{demo_server}/demo/..%2fapp.py")
    assert e.value.code == 404


def test_each_page_route_roundtrip(demo_server):
    out = _post(f"{demo_server}/retrieval", {"query": "a dog", "topK": 1})
    assert out["results"][0]["video"] == "v1.mp4"
    out = _post(f"{demo_server}/composed_retrieval",
                {"reference_video": "x.mp4", "text": "night", "topK": 1})
    assert out["results"] == ["v2.mp4"]
    out = _post(f"{demo_server}/caption", {"video": "x.mp4"})
    assert out["steps"] == [[1, 2], []]
    out = _post(f"{demo_server}/explain", {"video": "x.mp4", "topK": 1})
    assert out["prediction"] == "archery"
    assert out["object_top"][0]["concept"] == "bow"


def test_demo_disabled_by_default():
    service = EngineService()
    server, _ = serve_in_thread(service, port=0)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(f"{base}/demo/index.html")
        assert e.value.code == 404
    finally:
        server.shutdown()
