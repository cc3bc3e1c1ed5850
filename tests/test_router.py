"""Multi-model router tests (server-models.cpp analog): load/unload
instances, proxy by "model" field."""

import json
import socket
import time
import urllib.error
import urllib.request

import pytest

from tpullama.models.testing import make_tiny_llama_gguf
from tpullama.server.router import serve


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _post(base, path, body, timeout=600):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def router(tmp_path_factory):
    d = tmp_path_factory.mktemp("router")
    m1 = str(d / "alpha.gguf")
    make_tiny_llama_gguf(m1, seed=51)
    port = _free_port()
    httpd = serve(port=port, block=False,
                  extra_args=["--device", "cpu", "-c", "128"])
    base = f"http://127.0.0.1:{port}"
    for _ in range(50):
        try:
            urllib.request.urlopen(base + "/health", timeout=1)
            break
        except Exception:
            time.sleep(0.1)
    yield base, m1
    httpd.router.stop_all()
    httpd.shutdown()


def test_router_health_and_empty(router):
    base, _ = router
    with urllib.request.urlopen(base + "/health") as r:
        assert json.loads(r.read())["role"] == "router"
    with urllib.request.urlopen(base + "/v1/models") as r:
        assert json.loads(r.read())["data"] == []
    # proxying with nothing loaded -> 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/v1/completions", {"prompt": "x", "max_tokens": 2})
    assert e.value.code == 404


def test_router_load_proxy_unload(router):
    base, m1 = router
    out = _post(base, "/models/load", {"model": m1})
    assert out["success"] and out["name"] == "alpha.gguf"

    with urllib.request.urlopen(base + "/v1/models") as r:
        data = json.loads(r.read())["data"]
    assert data[0]["id"] == "alpha.gguf" and data[0]["status"] == "loaded"

    # proxy by model name (and by default when only one is loaded)
    res = _post(base, "/v1/completions",
                {"model": "alpha.gguf", "prompt": "Hello",
                 "max_tokens": 4, "temperature": 0})
    assert res["usage"]["completion_tokens"] >= 1
    res2 = _post(base, "/v1/completions",
                 {"prompt": "Hello", "max_tokens": 4, "temperature": 0})
    assert res2["choices"][0]["text"] == res["choices"][0]["text"]

    st = _post(base, "/models/status", {})
    assert st["data"][0]["status"] == "loaded"

    assert _post(base, "/models/unload", {"model": "alpha.gguf"})["success"]
    with urllib.request.urlopen(base + "/v1/models") as r:
        assert json.loads(r.read())["data"] == []
