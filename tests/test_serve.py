"""Batching inference server (deeplab_tpu/serve.py): dynamic batching must
preserve per-request results exactly, surface errors, and speak plain HTTP.

The reference has no serving story beyond notebook predict cells; these
tests pin the TPU-native batching front end's contract.
"""

import io
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image

from deeplab_tpu.serve import BatchingServer, _Dispatcher

SZ = (32, 32)


def _fake_pipeline(batch):
    """Deterministic mask: every pixel = (mean of its image) mod 21."""
    vals = (batch.mean(axis=(1, 2, 3)).astype(np.int32)) % 21
    return np.broadcast_to(vals[:, None, None],
                           (batch.shape[0],) + SZ).copy()


def _jpeg_bytes(seed):
    rng = np.random.RandomState(seed)
    arr = (rng.rand(40, 44, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")  # lossless: exact decode
    return buf.getvalue(), arr


def test_dispatcher_batches_and_routes_results():
    calls = []

    def pipeline(batch):
        calls.append(batch.shape[0])
        return _fake_pipeline(batch)

    d = _Dispatcher(pipeline, max_batch=4, max_wait_ms=500.0)
    imgs = [np.full(SZ + (3,), v, np.float32) for v in (10.0, 20.0, 30.0)]
    results = [None] * 3

    def worker(i):
        results[i] = d.submit(imgs[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    d.shutdown()
    for i, v in enumerate((10, 20, 30)):
        assert results[i] is not None
        np.testing.assert_array_equal(results[i],
                                      np.full(SZ, v % 21, np.int32))
    # concurrency made at least one multi-image batch (3 submits, <3 calls),
    # and every device call was padded to a power-of-2 bucket (compile-count
    # bound: at most log2(max_batch)+1 distinct shapes ever hit the device)
    assert len(calls) < 3
    assert all(c in (1, 2, 4) for c in calls)


def test_dispatcher_shutdown_unblocks_racing_submits():
    """A submit that lands after shutdown must error, not hang."""
    d = _Dispatcher(_fake_pipeline, max_batch=2, max_wait_ms=1.0)
    d.shutdown()
    with pytest.raises(RuntimeError, match="shut down"):
        d.submit(np.zeros(SZ + (3,), np.float32))


def test_dispatcher_propagates_errors():
    def boom(batch):
        raise RuntimeError("device on fire")

    d = _Dispatcher(boom, max_batch=2, max_wait_ms=1.0)
    with pytest.raises(RuntimeError, match="device on fire"):
        d.submit(np.zeros(SZ + (3,), np.float32))
    d.shutdown()


@pytest.fixture(scope="module")
def server():
    srv = BatchingServer(_fake_pipeline, SZ, max_batch=4, max_wait_ms=5.0,
                         meta={"pipeline": "test"})
    port = srv.start(port=0)
    yield srv, port
    srv.stop()


def test_healthz(server):
    _, port = server
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
        import json
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["image_size"] == list(SZ)
    assert body["pipeline"] == "test"


def test_predict_endpoint_round_trip(server):
    _, port = server
    data, arr = _jpeg_bytes(0)
    req = urllib.request.Request(f"http://127.0.0.1:{port}/predict",
                                 data=data, method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.headers["Content-Type"] == "image/png"
        classes = r.headers["X-Classes"]
        mask = np.asarray(Image.open(io.BytesIO(r.read())))
    assert mask.shape == SZ
    # the server must decode BGR + bilinear-resize exactly like the
    # Predictor file path does
    from deeplab_tpu.data.augment import resize_bilinear
    expect = _fake_pipeline(
        resize_bilinear(arr[..., ::-1], SZ[::-1]).astype(np.float32)[None])[0]
    np.testing.assert_array_equal(mask, expect)
    assert classes == ",".join(str(c) for c in np.unique(expect))


def test_predict_concurrent_requests_batch(server):
    _, port = server
    results = {}

    def post(i):
        data, _ = _jpeg_bytes(i)
        req = urllib.request.Request(f"http://127.0.0.1:{port}/predict",
                                     data=data, method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            results[i] = np.asarray(Image.open(io.BytesIO(r.read())))

    threads = [threading.Thread(target=post, args=(i,)) for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert len(results) == 5
    for i in range(5):
        data, arr = _jpeg_bytes(i)
        from deeplab_tpu.data.augment import resize_bilinear
        expect = _fake_pipeline(resize_bilinear(
            arr[..., ::-1], SZ[::-1]).astype(np.float32)[None])[0]
        np.testing.assert_array_equal(results[i], expect)


def test_bad_request_and_404(server):
    _, port = server
    req = urllib.request.Request(f"http://127.0.0.1:{port}/predict",
                                 data=b"not an image", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=10)
    assert e.value.code == 404


def test_server_over_real_artifact(tmp_path):
    """End to end: export a tiny artifact, serve it, POST an image."""
    import jax
    from deeplab_tpu.export import load_serving, save_serving
    from deeplab_tpu.models.seg_model import SegNet
    net = SegNet(SZ, 21, "mobilenetv2", "original")
    params, state = net.init(jax.random.key(0))
    path = tmp_path / "art.npz"
    save_serving(path, net, params, state, batch=None)
    art = load_serving(path)
    srv = BatchingServer(art, art.sz, max_batch=2, max_wait_ms=1.0)
    port = srv.start(port=0)
    try:
        data, arr = _jpeg_bytes(3)
        req = urllib.request.Request(f"http://127.0.0.1:{port}/predict",
                                     data=data, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            mask = np.asarray(Image.open(io.BytesIO(r.read())))
        assert mask.shape == SZ
        from deeplab_tpu.data.augment import resize_bilinear
        direct = art(resize_bilinear(
            arr[..., ::-1], SZ[::-1]).astype(np.float32)[None])[0]
        np.testing.assert_array_equal(mask, direct)
    finally:
        srv.stop()


def test_oversized_and_bogus_content_length(server):
    _, port = server
    import http.client
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    # absurd Content-Length is rejected up front (no buffering attempt)
    conn.request("POST", "/predict", body=b"x",
                 headers={"Content-Length": str(10 ** 10)})
    assert conn.getresponse().status == 413
    conn.close()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("POST", "/predict", body=b"",
                 headers={"Content-Length": "0"})
    assert conn.getresponse().status == 400
    conn.close()


def test_fixed_batch_pipeline_clamps_max_batch():
    """A fixed-batch ServingArtifact-like pipeline bounds the gather: a
    full bucket must never exceed what the artifact can execute."""
    class FakeArt:
        batch = 2

        def __call__(self, b):
            assert b.shape[0] <= 2
            return _fake_pipeline(b)

    srv = BatchingServer(FakeArt(), SZ, max_batch=8, max_wait_ms=1.0)
    try:
        assert srv.dispatcher.max_batch == 2
        assert srv.meta["max_batch"] == 2
    finally:
        srv.stop()


def test_multiline_device_error_yields_clean_500():
    """Multi-line exception text (XLA-style) must not reach the HTTP
    status line — the response stays parseable with a single-line reason."""
    def boom(batch):
        raise RuntimeError("device exploded\nlong traceback line\nmore")

    srv = BatchingServer(boom, SZ, max_batch=2, max_wait_ms=1.0)
    port = srv.start(port=0)
    try:
        data, _ = _jpeg_bytes(1)
        req = urllib.request.Request(f"http://127.0.0.1:{port}/predict",
                                     data=data, method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 500
        assert "\n" not in e.value.reason and "\r" not in e.value.reason
        body = e.value.read().decode()
        assert "device exploded" in body      # detail lives in the body
    finally:
        srv.stop()
