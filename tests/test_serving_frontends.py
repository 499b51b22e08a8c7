"""CLI chat + web frontend tests (llava/serve/cli.py, gradio_web_server)."""

import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from rsvldm_tpu.serving.cli import ChatSession, render_llama3_chat
from rsvldm_tpu.serving.web import WebServer


def test_render_llama3_chat_multi_turn():
    p = render_llama3_chat([("user", "<image>\nhello"),
                            ("assistant", "hi"),
                            ("user", "more")])
    assert p.startswith("<|begin_of_text|><|start_header_id|>system")
    assert p.count("<|start_header_id|>user") == 2
    assert p.count("<|start_header_id|>assistant") == 2  # incl. gen header
    assert p.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")


def test_chat_session_multi_turn(tmp_path):
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file
    import test_captioner as tc
    from rsvldm_tpu.models.vlm.captioner import LlavaCaptioner
    from rsvldm_tpu.models.vlm.generate import GenerateConfig

    d = tmp_path / "llava"
    d.mkdir()
    save_file(tc._tiny_llava_state_dict(), str(d / "model.safetensors"))
    cap = LlavaCaptioner.load(tmp_path, llama_cfg=tc.LCFG,
                              vision_cfg=tc.VCFG,
                              tokenizer=tc.FakeTokenizer())
    img = Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (40, 60, 3), dtype=np.uint8))
    sess = ChatSession(cap, img, GenerateConfig(max_new_tokens=4,
                                                temperature=0.0,
                                                do_sample=False))
    r1 = sess.ask("what is this")
    assert isinstance(r1, str)
    assert len(sess.turns) == 2 and sess.turns[1] == ("assistant", r1)
    # second turn: no image token re-splice, history grows
    r2 = sess.ask("zoom in")
    assert isinstance(r2, str) and len(sess.turns) == 4
    assert "<image>" not in sess.turns[2][1]


def _post(url, payload):
    req = urllib.request.Request(url, json.dumps(payload).encode(),
                                 {"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


def test_web_server_direct_dispatch():
    calls = []

    def fake_dispatch(payload):
        calls.append(payload)
        return {"caption": "ok", "n": len(calls)}

    srv = WebServer(dispatch_fn=fake_dispatch)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        with urllib.request.urlopen(base + "/", timeout=10) as r:
            assert b"Upscale" in r.read()
        out = _post(base + "/generate", {"image": "AAAA", "model": "m"})
        assert out == {"caption": "ok", "n": 1}
        assert calls[0]["image"] == "AAAA"
        # errors surface as HTTP 500 json
        def boom(_):
            raise RuntimeError("nope")
        srv.dispatch = boom
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/generate", {})
        assert ei.value.code == 500
    finally:
        srv.shutdown()


def test_web_server_controller_topology():
    """Web -> controller (/get_worker_address) -> worker (/worker_generate)
    round trip with an in-process controller and a stub worker."""
    from rsvldm_tpu.serving.controller import Controller
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class StubWorker(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(n))
            body = json.dumps({"echo": payload["image"]}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    wsrv = ThreadingHTTPServer(("127.0.0.1", 0), StubWorker)
    wthread = threading.Thread(target=wsrv.serve_forever, daemon=True)
    wthread.start()
    worker_url = f"http://127.0.0.1:{wsrv.server_address[1]}"

    ctrl = Controller()
    ctrl.register_worker(worker_url, ["rsvldm-sr"], queue_length=0)
    # drive the controller's dispatch logic in-process (its HTTP layer is
    # covered by test_serving_debug); the web server still does the real
    # worker POST over HTTP
    srv = WebServer(controller_url="http://unused")
    srv.dispatch = lambda payload: srv._post_json(
        ctrl.get_worker_address("rsvldm-sr") + "/worker_generate", payload)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        out = _post(f"http://127.0.0.1:{srv.port}/generate",
                    {"image": "IMGB64", "model": "rsvldm-sr"})
        assert out == {"echo": "IMGB64"}
    finally:
        srv.shutdown()
        wsrv.shutdown()
        wsrv.server_close()


def test_web_server_chat_page_and_images_payload():
    """/chat serves the multimodal page (gradio_web_server +
    gradio_multi_image parity); /generate renders the llama-3 chat
    template around the raw textarea prompt (the reference posts
    conv.get_prompt(), never raw text) and forwards the base64 images."""
    seen = []

    def fake_dispatch(payload):
        seen.append(payload)
        return {"text": f"{payload['prompt'].count('<image>')} imgs"}

    srv = WebServer(dispatch_fn=fake_dispatch)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        with urllib.request.urlopen(base + "/chat", timeout=10) as r:
            body = r.read()
        assert b"Multimodal chat" in body and b"placeholder" in body
        out = _post(base + "/generate",
                    {"prompt": "<image> and <image>", "images": ["aa", "bb"],
                     "model": "rsvldm-llm"})
        assert out == {"text": "2 imgs"}
        assert seen[0]["images"] == ["aa", "bb"]
        # chat template rendered around the raw prompt, placeholders intact
        assert seen[0]["prompt"].startswith("<|begin_of_text|>")
        assert "<|start_header_id|>assistant" in seen[0]["prompt"]
        # an already-rendered prompt passes through untouched
        out2 = _post(base + "/generate",
                     {"prompt": seen[0]["prompt"], "images": ["aa", "bb"],
                      "model": "rsvldm-llm"})
        assert seen[1]["prompt"] == seen[0]["prompt"]
    finally:
        srv.shutdown()
