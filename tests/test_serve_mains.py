"""`python -m rsvldm_tpu.serving.*` launchers (the reference's
`python -m llava.serve.controller / model_worker / sglang_worker /
gradio_web_server` launch commands).

Each main() is driven with block=False so the test gets the live server
back; model construction is monkeypatched where a real checkpoint would be
needed (the HTTP surface itself is what these tests pin down — the model
paths have their own suites).
"""

import base64
import io
import json
import urllib.request

import jax
import jax.numpy as jnp
import pytest

from rsvldm_tpu.models.vlm.llama import KVCache, LlamaConfig, LlamaModel

CFG = LlamaConfig(vocab_size=128, dim=32, layers=2, heads=4, kv_heads=2,
                  ffn_dim=64, dtype=jnp.float32)


def _post(url, payload, timeout=30):
    req = urllib.request.Request(url, json.dumps(payload).encode(),
                                 {"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def test_controller_main_serves():
    from rsvldm_tpu.serving.controller import main
    server = main(["--host", "127.0.0.1", "--port", "0",
                   "--dispatch-method", "lottery"], block=False)
    try:
        port = server.server_address[1]
        out = _post(f"http://127.0.0.1:{port}/list_models", {})
        assert out == {"models": []}
    finally:
        server.shutdown()
        server.server_close()


def test_web_main_routes_through_controller():
    from rsvldm_tpu.serving.controller import main as ctrl_main
    from rsvldm_tpu.serving.web import main as web_main
    ctrl = ctrl_main(["--host", "127.0.0.1", "--port", "0"], block=False)
    cport = ctrl.server_address[1]
    web = web_main(["--host", "127.0.0.1", "--port", "0",
                    "--controller-url", f"http://127.0.0.1:{cport}"],
                   block=False)
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{web.port}/", timeout=30) as r:
            assert b"rsvldm" in r.read()
        # no worker registered -> structured error, not a dropped socket
        out = _post(f"http://127.0.0.1:{web.port}/generate",
                    {"image": "", "model": "rsvldm-sr"})
        assert out == {"error": "no available worker"}
    finally:
        web.shutdown()
        ctrl.shutdown()
        ctrl.server_close()


def test_worker_main_end_to_end(monkeypatch, tmp_path):
    """model_worker launch: fake pipeline, real HTTP round-trip of a
    base64 PNG through /worker_generate."""
    from PIL import Image

    import rsvldm_tpu.pipeline as pl
    import rsvldm_tpu.utils.compile_cache as cc

    class FakePipeline:
        def __init__(self, cfg, debug_tiny=False, **kw):
            assert cfg.refine.edm_steps == 7      # --num_steps reached it
            assert cfg.refine.img_threshold == 0.25

        def process(self, image_path=None):
            return Image.open(image_path).resize((16, 16))

    monkeypatch.setattr(pl, "SuperResolutionPipeline", FakePipeline)
    monkeypatch.setattr(cc, "cli_setup", lambda *a, **k: None)

    from rsvldm_tpu.serving.worker import main
    w, server = main(["--host", "127.0.0.1", "--port", "0", "--no-register",
                      "--num_steps", "7", "--img_threshold", "0.25",
                      "--ckpt_dir", str(tmp_path)], block=False)
    try:
        port = server.server_address[1]
        buf = io.BytesIO()
        Image.new("RGB", (8, 8), (10, 200, 30)).save(buf, format="PNG")
        out = _post(f"http://127.0.0.1:{port}/worker_generate",
                    {"image": base64.b64encode(buf.getvalue()).decode()})
        img = Image.open(io.BytesIO(base64.b64decode(out["image"])))
        assert img.size == (16, 16)
        status = _post(f"http://127.0.0.1:{port}/worker_get_status", {})
        assert status["model_names"] == ["rsvldm-sr"]
    finally:
        w.stop()
        server.shutdown()
        server.server_close()


class _FakeTokenizer:
    def encode(self, s, add_special_tokens=False):
        return [(ord(c) % 96) + 1 for c in s]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)


class _FakeCaptioner:
    load_kwargs = None

    def __init__(self):
        self.llama = LlamaModel(CFG)
        cache = KVCache.init(CFG, 1, 8, jnp.float32)
        self.llama_params = self.llama.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32), cache, 0,
            method=self.llama.from_tokens)
        self.tokenizer = _FakeTokenizer()
        self.draft = None
        self.draft_params = None

    def embed_mm(self, prompt, images):
        assert images == []
        ids = jnp.asarray(self.tokenizer.encode(prompt), jnp.int32)
        return self.llama.apply(self.llama_params, ids,
                                method=self.llama.embed)


def test_llm_worker_main_end_to_end(monkeypatch, tmp_path):
    """sglang_worker launch: fake captioner load, real engine + HTTP
    generate; --load-4bit must reach LlavaCaptioner.load as quant='int4'."""
    import rsvldm_tpu.models.vlm.captioner as capmod
    import rsvldm_tpu.utils.compile_cache as cc

    def fake_load(ckpt_dir, **kw):
        _FakeCaptioner.load_kwargs = dict(kw, ckpt_dir=ckpt_dir)
        return _FakeCaptioner()

    monkeypatch.setattr(capmod.LlavaCaptioner, "load",
                        staticmethod(fake_load))
    monkeypatch.setattr(cc, "cli_setup", lambda *a, **k: None)

    from rsvldm_tpu.serving.llm_worker import main
    worker, server = main(
        ["--host", "127.0.0.1", "--port", "0", "--no-register",
         "--load-4bit", "--slots", "2", "--max-len", "256",
         "--max-new-tokens", "5", "--ckpt_dir", str(tmp_path)],
        block=False)
    try:
        assert _FakeCaptioner.load_kwargs["quant"] == "int4"
        port = server.server_address[1]
        out = _post(f"http://127.0.0.1:{port}/worker_generate",
                    {"prompt": "hello engine"})
        assert isinstance(out["text"], str) and out["text"]
        assert len(out["text"].split()) == 5  # max_new_tokens, no eot hit
    finally:
        worker.stop()
        server.shutdown()
        server.server_close()


def test_register_worker_cli_and_refresh(monkeypatch, tmp_path):
    """register_worker CLI: controller probes the worker's own status
    (worker_status: None semantics); refresh_all_workers drops it once it
    stops answering."""
    from PIL import Image

    import rsvldm_tpu.pipeline as pl
    import rsvldm_tpu.utils.compile_cache as cc

    class FakePipeline:
        def __init__(self, *a, **k):
            pass

        def process(self, image_path=None):
            return Image.open(image_path)

    monkeypatch.setattr(pl, "SuperResolutionPipeline", FakePipeline)
    monkeypatch.setattr(cc, "cli_setup", lambda *a, **k: None)

    from rsvldm_tpu.serving.controller import main as ctrl_main
    from rsvldm_tpu.serving.register_worker import main as reg_main
    from rsvldm_tpu.serving.worker import main as worker_main

    ctrl = ctrl_main(["--host", "127.0.0.1", "--port", "0"], block=False)
    cport = ctrl.server_address[1]
    w, server = worker_main(["--host", "127.0.0.1", "--port", "0",
                             "--no-register", "--ckpt_dir", str(tmp_path)],
                            block=False)
    wport = server.server_address[1]
    try:
        assert reg_main(["--controller-address", f"http://127.0.0.1:{cport}",
                         "--worker-name", f"http://127.0.0.1:{wport}"])
        out = _post(f"http://127.0.0.1:{cport}/list_models", {})
        assert out == {"models": ["rsvldm-sr"]}
        # registering an unreachable worker is refused, not recorded
        assert not reg_main(
            ["--controller-address", f"http://127.0.0.1:{cport}",
             "--worker-name", "http://127.0.0.1:1"])
        # worker dies -> refresh_all_workers prunes it
        server.shutdown()
        server.server_close()
        out = _post(f"http://127.0.0.1:{cport}/refresh_all_workers", {})
        assert out == {"removed": [f"http://127.0.0.1:{wport}"]}
        assert _post(f"http://127.0.0.1:{cport}/list_models",
                     {}) == {"models": []}
    finally:
        w.stop()
        ctrl.shutdown()
        ctrl.server_close()


def test_test_message_cli_streams_through_controller(monkeypatch, tmp_path,
                                                     capsys):
    """test_message CLI: controller resolution (refresh + list_models +
    get_worker_address) then a streamed templated generate."""
    import rsvldm_tpu.models.vlm.captioner as capmod
    import rsvldm_tpu.utils.compile_cache as cc

    monkeypatch.setattr(capmod.LlavaCaptioner, "load",
                        staticmethod(lambda ckpt_dir, **kw: _FakeCaptioner()))
    monkeypatch.setattr(cc, "cli_setup", lambda *a, **k: None)

    from rsvldm_tpu.serving.controller import main as ctrl_main
    from rsvldm_tpu.serving.llm_worker import main as llm_main
    from rsvldm_tpu.serving.test_message import main as msg_main

    ctrl = ctrl_main(["--host", "127.0.0.1", "--port", "0"], block=False)
    cport = ctrl.server_address[1]
    worker, server = llm_main(
        ["--host", "127.0.0.1", "--port", "0",
         "--controller-address", f"http://127.0.0.1:{cport}",
         "--slots", "2", "--max-len", "512",
         "--ckpt_dir", str(tmp_path)], block=False)
    try:
        text = msg_main(["--controller-address", f"http://127.0.0.1:{cport}",
                         "--model-name", "rsvldm-llm",
                         "--max-new-tokens", "4", "--temperature", "0",
                         "--message", "hi there"])
        assert text and len(text.split()) == 4
        outlines = capsys.readouterr().out
        assert "Models: ['rsvldm-llm']" in outlines
        assert f"worker_addr: http://127.0.0.1:{server.server_address[1]}" \
            in outlines
    finally:
        worker.stop()
        server.shutdown()
        server.server_close()
        ctrl.shutdown()
        ctrl.server_close()


def test_web_generate_stream_relays_frames(monkeypatch, tmp_path):
    """/generate_stream relays the worker's growing-prefix ndjson frames
    through the controller topology (gradio streaming parity)."""
    import rsvldm_tpu.models.vlm.captioner as capmod
    import rsvldm_tpu.utils.compile_cache as cc

    monkeypatch.setattr(capmod.LlavaCaptioner, "load",
                        staticmethod(lambda ckpt_dir, **kw: _FakeCaptioner()))
    monkeypatch.setattr(cc, "cli_setup", lambda *a, **k: None)

    from rsvldm_tpu.serving.controller import main as ctrl_main
    from rsvldm_tpu.serving.llm_worker import main as llm_main
    from rsvldm_tpu.serving.web import main as web_main

    ctrl = ctrl_main(["--host", "127.0.0.1", "--port", "0"], block=False)
    cport = ctrl.server_address[1]
    worker, server = llm_main(
        ["--host", "127.0.0.1", "--port", "0",
         "--controller-address", f"http://127.0.0.1:{cport}",
         "--slots", "2", "--max-len", "512",
         "--ckpt_dir", str(tmp_path)], block=False)
    web = web_main(["--host", "127.0.0.1", "--port", "0",
                    "--controller-url", f"http://127.0.0.1:{cport}"],
                   block=False)
    try:
        body = json.dumps({"prompt": "stream me", "model": "rsvldm-llm",
                           "max_new_tokens": 6, "raw_prompt": True})
        req = urllib.request.Request(
            f"http://127.0.0.1:{web.port}/generate_stream", body.encode(),
            {"Content-Type": "application/json"})
        frames = []
        with urllib.request.urlopen(req, timeout=60) as r:
            for line in r:
                if line.strip():
                    frames.append(json.loads(line))
        assert frames and frames[-1].get("finished")
        assert len(frames[-1]["text"].split()) == 6
        assert len({f["text"] for f in frames}) > 1  # grew incrementally

        # no worker for the model -> structured error frame
        req = urllib.request.Request(
            f"http://127.0.0.1:{web.port}/generate_stream",
            json.dumps({"prompt": "x", "model": "nope",
                        "raw_prompt": True}).encode(),
            {"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            err = [json.loads(l) for l in r if l.strip()]
        assert err == [{"error": "no available worker"}]
    finally:
        web.shutdown()
        worker.stop()
        server.shutdown()
        server.server_close()
        ctrl.shutdown()
        ctrl.server_close()


def test_llm_worker_main_missing_ckpt(monkeypatch, tmp_path):
    import rsvldm_tpu.utils.compile_cache as cc
    monkeypatch.setattr(cc, "cli_setup", lambda *a, **k: None)
    from rsvldm_tpu.serving.llm_worker import main
    with pytest.raises(SystemExit):
        main(["--ckpt_dir", str(tmp_path / "nope"), "--no-register"],
             block=False)


def test_llm_worker_main_draft_conflicts(monkeypatch, tmp_path):
    """speculative decoding x prefix-cache/chunked-prefill conflicts must
    resolve at LAUNCH: explicit --draft_dir errors, an auto-discovered
    draft is suppressed (draft_dir=False reaches load), --no-draft opts
    out unconditionally."""
    import rsvldm_tpu.models.vlm.captioner as capmod
    import rsvldm_tpu.utils.compile_cache as cc

    def fake_load(ckpt_dir, **kw):
        _FakeCaptioner.load_kwargs = dict(kw, ckpt_dir=ckpt_dir)
        return _FakeCaptioner()

    monkeypatch.setattr(capmod.LlavaCaptioner, "load",
                        staticmethod(fake_load))
    monkeypatch.setattr(cc, "cli_setup", lambda *a, **k: None)
    from rsvldm_tpu.serving.llm_worker import main

    with pytest.raises(SystemExit, match="does not compose"):
        main(["--no-register", "--draft_dir", str(tmp_path),
              "--prefill-chunk", "128", "--ckpt_dir", str(tmp_path)],
             block=False)
    with pytest.raises(SystemExit, match="does not compose"):
        main(["--no-register", "--self-draft", "2",
              "--prefill-chunk", "128", "--ckpt_dir", str(tmp_path)],
             block=False)

    (tmp_path / "llava_draft").mkdir()
    worker, server = main(["--host", "127.0.0.1", "--port", "0",
                           "--no-register", "--prefill-chunk", "128",
                           "--ckpt_dir", str(tmp_path)], block=False)
    try:
        assert _FakeCaptioner.load_kwargs["draft_dir"] is False
    finally:
        worker.stop()
        server.shutdown()
        server.server_close()

    worker, server = main(["--host", "127.0.0.1", "--port", "0",
                           "--no-register", "--no-draft",
                           "--ckpt_dir", str(tmp_path)], block=False)
    try:
        assert _FakeCaptioner.load_kwargs["draft_dir"] is False
    finally:
        worker.stop()
        server.shutdown()
        server.server_close()


def test_worker_survives_absent_controller(monkeypatch, tmp_path):
    """A worker started before its controller must come up and serve —
    the model load is minutes long and the heartbeat loop re-registers."""
    from PIL import Image

    import rsvldm_tpu.pipeline as pl
    import rsvldm_tpu.utils.compile_cache as cc

    class FakePipeline:
        def __init__(self, *a, **k):
            pass

        def process(self, image_path=None):
            return Image.open(image_path)

    monkeypatch.setattr(pl, "SuperResolutionPipeline", FakePipeline)
    monkeypatch.setattr(cc, "cli_setup", lambda *a, **k: None)
    from rsvldm_tpu.serving.worker import main
    w, server = main(["--host", "127.0.0.1", "--port", "0",
                      "--controller-address", "http://127.0.0.1:1",
                      "--ckpt_dir", str(tmp_path)], block=False)
    try:
        port = server.server_address[1]
        status = _post(f"http://127.0.0.1:{port}/worker_get_status", {})
        assert status["model_names"] == ["rsvldm-sr"]
    finally:
        w.stop()
        server.shutdown()
        server.server_close()


def test_llm_stream_client_disconnect_keeps_worker_alive(monkeypatch,
                                                         tmp_path):
    """A client hanging up mid-/worker_generate_stream must not corrupt
    the handler (second response into the aborted chunk stream) — the
    next request on a fresh connection serves normally."""
    import socket

    import rsvldm_tpu.models.vlm.captioner as capmod
    import rsvldm_tpu.utils.compile_cache as cc

    monkeypatch.setattr(capmod.LlavaCaptioner, "load",
                        staticmethod(lambda ckpt_dir, **kw: _FakeCaptioner()))
    monkeypatch.setattr(cc, "cli_setup", lambda *a, **k: None)
    from rsvldm_tpu.serving.llm_worker import main
    worker, server = main(["--host", "127.0.0.1", "--port", "0",
                           "--no-register", "--max-new-tokens", "200",
                           "--max-len", "512", "--ckpt_dir", str(tmp_path)],
                          block=False)
    try:
        port = server.server_address[1]
        body = json.dumps({"prompt": "stream then vanish",
                           "max_new_tokens": 200}).encode()
        s = socket.create_connection(("127.0.0.1", port), timeout=10)
        s.sendall(b"POST /worker_generate_stream HTTP/1.1\r\n"
                  b"Host: x\r\nContent-Type: application/json\r\n"
                  + f"Content-Length: {len(body)}\r\n\r\n".encode() + body)
        s.recv(256)  # headers + first frames arrived
        s.close()    # hang up mid-stream
        out = _post(f"http://127.0.0.1:{port}/worker_generate",
                    {"prompt": "after the disconnect",
                     "max_new_tokens": 3})
        assert len(out["text"].split()) == 3
    finally:
        worker.stop()
        server.shutdown()
        server.server_close()
