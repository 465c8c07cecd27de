import json
import threading
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig, SamplingConfig
from tokenhawk_tpu.models.llama import params_from_ggml
from tokenhawk_tpu.runtime.scheduler import Scheduler
from tokenhawk_tpu.serving.server import serve
from tokenhawk_tpu.tokenizer import byte_fallback_vocab

from helpers import make_ggml_weights

CFG = LlamaConfig.tiny(n_vocab=512, n_ctx=64)


@pytest.fixture(scope="module")
def server():
    rng = np.random.default_rng(11)
    params = params_from_ggml(CFG, make_ggml_weights(CFG, rng), dtype=jnp.float32)
    sched = Scheduler(
        CFG, params, sampling=SamplingConfig(temperature=0.0),
        max_batch=2, cache_dtype=jnp.float32, decode_chunk=4,
    )
    httpd = serve(sched, byte_fallback_vocab(), host="127.0.0.1", port=0,
                  model_info={"model": "tiny-test"})
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()
    httpd.serving_loop.stop()


def test_health(server):
    with urllib.request.urlopen(server + "/health", timeout=30) as r:
        data = json.loads(r.read())
    assert data["status"] == "ok"
    assert data["model"] == "tiny-test"


def test_index_served(server):
    with urllib.request.urlopen(server + "/", timeout=30) as r:
        body = r.read().decode()
    assert "tokenhawk" in body
    with urllib.request.urlopen(server + "/chat.js", timeout=30) as r:
        assert "generate" in r.read().decode()


def test_generate_streams_tokens(server):
    req = urllib.request.Request(
        server + "/generate",
        data=json.dumps({"prompt": "hi", "max_tokens": 6}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        body = r.read().decode()
    frames = [f for f in body.split("\n\n") if f.strip()]
    assert any(f.startswith("event: done") for f in frames)
    data_frames = [f for f in frames if f.startswith("data: ")]
    # Each data frame carries a decoded token string.
    for f in data_frames:
        payload = json.loads(f[6:])
        assert "token" in payload


def test_bad_request(server):
    req = urllib.request.Request(
        server + "/generate", data=b"{}",
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
