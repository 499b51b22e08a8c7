"""Serving control plane + debug utilities tests."""

import json
import time
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from rsvldm_tpu.serving import Controller, Worker
from rsvldm_tpu.utils import debug


def test_controller_registry_and_dispatch():
    c = Controller(dispatch_method="shortest_queue")
    c.register_worker("w1", ["sr"], speed=1.0, queue_length=5)
    c.register_worker("w2", ["sr"], speed=1.0, queue_length=1)
    assert c.get_worker_address("sr") == "w2"
    assert c.list_models() == ["sr"]
    assert c.get_worker_address("nope") == ""

    # heartbeat updates queue; unknown worker must re-register
    assert c.receive_heart_beat("w1", 0)
    assert not c.receive_heart_beat("ghost", 0)
    assert c.get_worker_address("sr") == "w1"


def test_controller_stale_expiry():
    c = Controller()
    c.register_worker("w1", ["sr"])
    c.workers["w1"].last_heart_beat = time.time() - 1000
    stale = c.remove_stale_workers()
    assert stale == ["w1"]
    assert c.list_models() == []


def test_controller_http_roundtrip():
    c = Controller()
    server = c.serve(host="127.0.0.1", port=0)
    port = server.server_address[1]

    def post(path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", json.dumps(payload).encode(),
            {"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=5) as r:
            return json.loads(r.read())

    post("/register_worker", dict(worker_name="w", model_names=["sr"]))
    assert post("/list_models", {})["models"] == ["sr"]
    assert post("/get_worker_address", dict(model="sr"))["address"] == "w"
    server.shutdown()


def test_nan_guard():
    debug.test_for_nans(jnp.ones((4,)))
    with pytest.raises(debug.NansException):
        debug.test_for_nans(jnp.array([1.0, np.nan]))


def test_tree_finite():
    assert debug.tree_finite({"a": jnp.ones(3), "b": jnp.zeros(2)})
    assert not debug.tree_finite({"a": jnp.array([np.inf])})


def test_stage_timer(caplog):
    import logging
    with caplog.at_level(logging.INFO, logger="rsvldm"):
        with debug.stage_timer("unit") as h:
            h["out"] = jnp.ones((8,)) * 2
    assert h["seconds"] >= 0
