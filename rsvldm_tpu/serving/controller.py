"""Serving control plane: worker registry with heartbeat expiry + dispatch.

Parity target: /root/reference llava/serve/controller.py (:28-120 —
DispatchMethod lottery/shortest-queue, heartbeat-based worker expiry,
FastAPI endpoints). Rebuilt dependency-free on http.server (fastapi is not
in the image): same REST surface — /register_worker, /receive_heart_beat,
/list_models, /get_worker_address — and the same expiry/dispatch logic.
"""

from __future__ import annotations

import dataclasses
import json
import random
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

HEARTBEAT_EXPIRATION = 90  # controller.py:51-55


@dataclasses.dataclass
class WorkerInfo:
    model_names: list
    speed: float
    queue_length: int
    last_heart_beat: float


class Controller:
    def __init__(self, dispatch_method: str = "shortest_queue"):
        assert dispatch_method in ("lottery", "shortest_queue")
        self.dispatch_method = dispatch_method
        self.workers: dict[str, WorkerInfo] = {}
        self.lock = threading.Lock()

    # ---- registry ----
    def register_worker(self, name: str, model_names: list,
                        speed: float = 1.0, queue_length: int = 0):
        with self.lock:
            self.workers[name] = WorkerInfo(model_names, speed, queue_length,
                                            time.time())

    def receive_heart_beat(self, name: str, queue_length: int) -> bool:
        with self.lock:
            w = self.workers.get(name)
            if w is None:
                return False  # worker must re-register (controller.py:118)
            w.queue_length = queue_length
            w.last_heart_beat = time.time()
            return True

    def remove_stale_workers(self):
        cutoff = time.time() - HEARTBEAT_EXPIRATION
        with self.lock:
            stale = [n for n, w in self.workers.items()
                     if w.last_heart_beat < cutoff]
            for n in stale:
                del self.workers[n]
        return stale

    def list_models(self) -> list:
        with self.lock:
            names = set()
            for w in self.workers.values():
                names.update(w.model_names)
        return sorted(names)

    # ---- dispatch (controller.py:28-39) ----
    def get_worker_address(self, model_name: str) -> str:
        with self.lock:
            cand = [(n, w) for n, w in self.workers.items()
                    if model_name in w.model_names]
            if not cand:
                return ""
            if self.dispatch_method == "lottery":
                weights = [w.speed for _, w in cand]
                return random.choices([n for n, _ in cand], weights=weights)[0]
            # shortest queue, normalized by speed
            return min(cand, key=lambda nw: nw[1].queue_length
                       / max(nw[1].speed, 1e-6))[0]

    # ---- http ----
    def serve(self, host: str = "0.0.0.0", port: int = 10000):
        ctrl = self

        class Handler(BaseHTTPRequestHandler):
            def _json(self, obj, code=200):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/register_worker":
                    ctrl.register_worker(payload["worker_name"],
                                         payload.get("model_names", []),
                                         payload.get("speed", 1.0),
                                         payload.get("queue_length", 0))
                    self._json({"ok": True})
                elif self.path == "/receive_heart_beat":
                    ok = ctrl.receive_heart_beat(payload["worker_name"],
                                                 payload.get("queue_length", 0))
                    self._json({"exist": ok})
                elif self.path == "/list_models":
                    ctrl.remove_stale_workers()
                    self._json({"models": ctrl.list_models()})
                elif self.path == "/get_worker_address":
                    ctrl.remove_stale_workers()
                    self._json({"address": ctrl.get_worker_address(
                        payload.get("model", ""))})
                else:
                    self._json({"error": "unknown endpoint"}, 404)

            def log_message(self, *a):
                pass

        server = ThreadingHTTPServer((host, port), Handler)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        return server
