import base64
import io
import json
import os

import numpy as np
import pytest
from PIL import Image

from inklayer_tpu.serve.app import InkLayerApp


class FakePipeline:
    """Minimal stand-in writing the output contract the app reads."""

    def __init__(self):
        self.inpainter = None
        self.calls = []

    def run(self, input_path, out_base, no_intermediate=False, inpaint=False):
        self.calls.append(input_path)
        name = os.path.basename(input_path).split(".")[0]
        out = os.path.join(out_base, name)
        os.makedirs(os.path.join(out, "complete_layers_rgba"), exist_ok=True)
        for i in range(3):
            Image.fromarray(np.zeros((8, 8, 4), np.uint8)).save(
                os.path.join(out, "complete_layers_rgba", f"layer_{i}.png"))
        return out


def call(app, method, path, body=b"", content_type="application/json"):
    captured = {}

    def start_response(status, headers):
        captured["status"] = status
        captured["headers"] = dict(headers)

    environ = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "CONTENT_LENGTH": str(len(body)),
        "CONTENT_TYPE": content_type,
        "wsgi.input": io.BytesIO(body),
    }
    out = b"".join(app(environ, start_response))
    return captured["status"], out


@pytest.fixture()
def app(tmp_path):
    return InkLayerApp(pipeline=FakePipeline(), root_dir=str(tmp_path))


def test_index_served(app):
    status, body = call(app, "GET", "/")
    assert status == "200 OK"
    assert b"InkLayer" in body


def test_canvas_tools_present(app):
    """Drawing-ergonomics parity with the reference canvas
    (canvas_ui.js:17-53,104-105): brush size + color controls and
    stored-path undo."""
    _, body = call(app, "GET", "/")
    for frag in (b'id="brushSize"', b'id="brushSizeDisplay"',
                 b'id="brushColor"', b'id="undo"', b"redrawCanvas",
                 b"paths.pop()"):
        assert frag in body, frag


def test_404(app):
    status, _ = call(app, "GET", "/nope")
    assert status == "404 Not Found"


def test_save_canvas_and_segment(app):
    img = Image.fromarray(np.full((16, 16, 3), 255, np.uint8))
    buf = io.BytesIO()
    img.save(buf, "PNG")
    data_url = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    status, body = call(app, "POST", "/save-canvas-drawing",
                        json.dumps({"imageData": data_url,
                                    "filename": "testsketch"}).encode())
    assert status == "200 OK"
    assert json.loads(body)["filename"] == "testsketch.png"

    status, body = call(app, "POST", "/segment-sketch",
                        json.dumps({"imageName": "testsketch"}).encode())
    assert status == "200 OK"
    layers = json.loads(body)["layers"]
    assert len(layers) == 3
    # reversed ordering: highest index first (app.py:43-52)
    assert "layer_2" in layers[0] and "layer_0" in layers[-1]


def test_segment_missing_image(app):
    status, body = call(app, "POST", "/segment-sketch",
                        json.dumps({"imageName": "ghost"}).encode())
    assert status == "404 Not Found"
    status, _ = call(app, "POST", "/segment-sketch", b"{}")
    assert status == "400 Bad Request"


def test_upload_multipart(app):
    img = Image.fromarray(np.full((8, 8, 4), 128, np.uint8))
    buf = io.BytesIO()
    img.save(buf, "PNG")
    payload = buf.getvalue()
    boundary = "XBOUND"
    body = (f"--{boundary}\r\n"
            f'Content-Disposition: form-data; name="image"; filename="t.png"\r\n'
            f"Content-Type: image/png\r\n\r\n").encode() + payload + \
        f"\r\n--{boundary}--\r\n".encode()
    status, resp = call(app, "POST", "/upload-image", body,
                        f"multipart/form-data; boundary={boundary}")
    assert status == "200 OK"
    data = json.loads(resp)
    assert data["filename"] == "t.png"
    # alpha flattened onto white
    saved = Image.open(os.path.join(app.upload_dir, "t.png"))
    assert saved.mode == "RGB"


def test_get_images(app):
    with open(os.path.join(app.upload_dir, "x.png"), "wb") as f:
        f.write(b"fake")
    status, body = call(app, "GET", "/get-images")
    assert status == "200 OK"
    assert "/static/uploads/x.png" in json.loads(body)["images"]


@pytest.mark.slow
def test_serve_with_real_tiny_pipeline(tmp_path):
    """Full /save-canvas-drawing -> /segment-sketch through the REAL (tiny)
    pipeline on CPU — the complete serving integration path."""
    import base64

    from inklayer_tpu.build import build_pipeline
    from tests.test_pipeline import TINY_PIPE

    pipeline = build_pipeline(TINY_PIPE)
    pipeline.inpainter = None  # skip the diffusion stage in this test
    app = InkLayerApp(pipeline=pipeline, root_dir=str(tmp_path))

    g = np.full((96, 96, 3), 255, np.uint8)
    g[20:60, 20:23] = 0
    g[20:23, 20:60] = 0
    g[57:60, 20:60] = 0
    g[20:60, 57:60] = 0
    buf = io.BytesIO()
    Image.fromarray(g).save(buf, "PNG")
    data_url = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    status, body = call(app, "POST", "/save-canvas-drawing",
                        json.dumps({"imageData": data_url,
                                    "filename": "real"}).encode())
    assert status == "200 OK"
    status, body = call(app, "POST", "/segment-sketch",
                        json.dumps({"imageName": "real"}).encode())
    # inpainter=None: pipeline.run(inpaint=True) logs and skips; layers list
    # is then empty, but the output dir exists with the full mask contract
    assert status == "200 OK"
    assert os.path.exists(os.path.join(app.output_dir, "real", "masks_final"))


@pytest.mark.slow
def test_serve_micro_batch_factory(tmp_path):
    """micro_batch=True wires the shared BatchedSamEncoder into the lazily
    built pipeline; /segment-sketch still serves correctly through it."""
    import base64

    from inklayer_tpu.build import build_pipeline
    from tests.test_pipeline import TINY_PIPE

    def factory():
        p = build_pipeline(TINY_PIPE)
        p.inpainter = None
        return p

    app = InkLayerApp(pipeline_factory=factory, root_dir=str(tmp_path),
                      micro_batch=True)
    g = np.full((64, 64, 3), 255, np.uint8)
    g[10:50, 10:13] = 0
    g[10:13, 10:50] = 0
    buf = io.BytesIO()
    Image.fromarray(g).save(buf, "PNG")
    data_url = ("data:image/png;base64,"
                + base64.b64encode(buf.getvalue()).decode())
    status, _ = call(app, "POST", "/save-canvas-drawing",
                     json.dumps({"imageData": data_url,
                                 "filename": "mb"}).encode())
    assert status == "200 OK"
    status, _ = call(app, "POST", "/segment-sketch",
                     json.dumps({"imageName": "mb"}).encode())
    assert status == "200 OK"
    assert app._pipeline._batched_encoder is not None
    assert app._pipeline.sam.encode_fn is not None
    app._pipeline._batched_encoder.close()


@pytest.mark.slow
def test_concurrent_requests_share_encoder_batch(tmp_path):
    """Two in-flight /segment-sketch requests run concurrently (per-image
    locks + semaphore, not one global lock) and their SAM ViT encodes share
    ONE batched launch through the default-on MicroBatcher (BASELINE
    config 5 'continuous-batched TPU inference'; the reference handles
    requests strictly sequentially, custom_interface/app.py:71-98)."""
    import threading

    from inklayer_tpu.build import build_pipeline
    from tests.test_pipeline import TINY_PIPE

    pipeline = build_pipeline(TINY_PIPE)
    pipeline.inpainter = None
    app = InkLayerApp(pipeline=pipeline, root_dir=str(tmp_path))  # defaults
    be = pipeline._batched_encoder
    assert be is not None, "micro_batch must default ON"

    def save(name):
        g = np.full((64, 64, 3), 255, np.uint8)
        g[10:50, 10:13] = 0
        g[10:13, 10:50] = 0
        buf = io.BytesIO()
        Image.fromarray(g).save(buf, "PNG")
        data_url = ("data:image/png;base64,"
                    + base64.b64encode(buf.getvalue()).decode())
        status, _ = call(app, "POST", "/save-canvas-drawing",
                         json.dumps({"imageData": data_url,
                                     "filename": name}).encode())
        assert status == "200 OK"

    def segment(name, out):
        status, body = call(app, "POST", "/segment-sketch",
                            json.dumps({"imageName": name}).encode())
        out[name] = (status, body)

    for n in ("warm", "c1", "c2"):
        save(n)
    # warm-up request compiles every stage jit (sequential)
    res = {}
    segment("warm", res)
    assert res["warm"][0] == "200 OK"

    # instrument the batcher: record every encoder launch's batch size and
    # widen the batching window so the two requests deterministically meet
    sizes = []
    orig_fn = be.batcher.fn

    def recording_fn(imgs):
        sizes.append(int(imgs.shape[0]))
        return orig_fn(imgs)

    be.batcher.fn = recording_fn
    be.batcher.max_wait = 5.0
    t1 = threading.Thread(target=segment, args=("c1", res))
    t2 = threading.Thread(target=segment, args=("c2", res))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert res["c1"][0] == "200 OK" and res["c2"][0] == "200 OK"
    assert 2 in sizes, f"encoder batches were {sizes} — requests did not share"
    assert os.path.exists(os.path.join(app.output_dir, "c1", "masks_final"))
    assert os.path.exists(os.path.join(app.output_dir, "c2", "masks_final"))
    be.close()


def test_demo_gallery_flow(app, tmp_path, monkeypatch):
    """get-demos -> demo-image -> use-demo copies the sketch into uploads
    (reference canvas_ui.js demo gallery flow)."""
    demo_dir = tmp_path / "demos"
    os.makedirs(demo_dir, exist_ok=True)
    Image.fromarray(np.full((8, 8, 3), 255, np.uint8)).save(
        str(demo_dir / "bunny.png"))
    monkeypatch.setenv("INKLAYER_DEMO_DIR", str(demo_dir))

    status, body = call(app, "GET", "/get-demos")
    assert status == "200 OK"
    assert json.loads(body)["demos"] == ["bunny.png"]

    status, body = call(app, "GET", "/demo-image/bunny.png")
    assert status == "200 OK"

    status, body = call(app, "POST", "/use-demo",
                        json.dumps({"name": "bunny.png"}).encode())
    assert status == "200 OK"
    res = json.loads(body)
    assert res["filename"] == "bunny.png"
    assert os.path.exists(os.path.join(app.upload_dir, "bunny.png"))
    # path traversal is rejected
    status, _ = call(app, "POST", "/use-demo",
                     json.dumps({"name": "../secret.png"}).encode())
    assert status == "404 Not Found"


def test_get_layers_for_processed_image(app):
    """GET /get-images/<name> returns precomputed layers reversed
    (front-most first), matching the segment-sketch response order."""
    out = os.path.join(app.output_dir, "scene")
    os.makedirs(os.path.join(out, "complete_layers_rgba"), exist_ok=True)
    for i in range(3):
        Image.fromarray(np.zeros((4, 4, 4), np.uint8)).save(
            os.path.join(out, "complete_layers_rgba", f"layer_{i}.png"))
    status, body = call(app, "GET", "/get-images/scene")
    assert status == "200 OK"
    res = json.loads(body)
    ids = [u.split("layer_")[1].split(".")[0] for u in res["layers"]]
    assert ids == ["2", "1", "0"]
    # unprocessed image -> empty list, not an error
    status, body = call(app, "GET", "/get-images/nope")
    assert status == "200 OK"
    assert json.loads(body)["layers"] == []


def test_concurrent_inpaint_serializes_on_single_slot_lock(tmp_path):
    """Concurrent /inpaint requests for DIFFERENT images must not run the
    diffusion stage concurrently: they serialize on pipeline.inpaint_lock
    (one in-flight 768² sample on device; diffusion serializes there
    anyway, mirroring run_dir's workers=1 choice)."""
    import threading
    import time as _time

    inflight = {"n": 0, "max": 0}
    guard = threading.Lock()

    class FakeInpainter:
        def inpaint_single_layer(self, image, mask, prompt):
            with guard:
                inflight["n"] += 1
                inflight["max"] = max(inflight["max"], inflight["n"])
            _time.sleep(0.05)
            with guard:
                inflight["n"] -= 1
            return Image.new("RGB", image.size, (255, 255, 255))

    class FakeInpaintPipeline(FakePipeline):
        def __init__(self):
            super().__init__()
            self.inpainter = FakeInpainter()
            self.inpaint_lock = threading.Lock()

    app = InkLayerApp(pipeline=FakeInpaintPipeline(), root_dir=str(tmp_path))
    for name in ("imgA", "imgB"):
        out = os.path.join(app.output_dir, name)
        os.makedirs(os.path.join(out, "masks_disjoint"), exist_ok=True)
        m = np.zeros((16, 16), np.uint8)
        m[4:12, 4:12] = 255
        Image.fromarray(m).save(os.path.join(out, "masks_disjoint",
                                             "mask_0.png"))
        Image.fromarray(np.full((16, 16, 3), 255, np.uint8)).save(
            os.path.join(out, "input.png"))

    results = {}

    def inpaint(name):
        status, body = call(app, "POST", "/inpaint", json.dumps({
            "image_name": name, "layer_id": 0,
            "layer_path": f"/static/outputs/{name}/x.png",
            "prompt": "a sketch"}).encode())
        results[name] = status

    threads = [threading.Thread(target=inpaint, args=(n,))
               for n in ("imgA", "imgB")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == {"imgA": "200 OK", "imgB": "200 OK"}
    assert inflight["max"] == 1, "diffusion ran concurrently"
