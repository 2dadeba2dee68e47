"""Viz backend tests: REST contract, WebSocket handshake + metric push over a
real socket, dynamic model building, full start→metrics→stop cycle."""

import json
import socket
import threading
import time
import urllib.request

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph
from deepflows_tpu.viz import build_dynamic_model, make_server
from deepflows_tpu.viz.websocket import encode_frame, read_frame


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


@pytest.fixture()
def server():
    srv = make_server("127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{port}", srv
    srv.state.flags["stop"] = True
    srv.manager.stop_monitoring()
    srv.shutdown()


def _post(host, path, payload=None):
    req = urllib.request.Request(
        f"http://{host}{path}",
        data=json.dumps(payload or {}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


def _get(host, path):
    with urllib.request.urlopen(f"http://{host}{path}", timeout=10) as r:
        return r.read()


def _ws_connect(host):
    ip, port = host.split(":")
    sock = socket.create_connection((ip, int(port)), timeout=30)
    sock.sendall(
        b"GET /ws HTTP/1.1\r\nHost: " + host.encode() + b"\r\n"
        b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
        b"Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
        b"Sec-WebSocket-Version: 13\r\n\r\n"
    )
    resp = b""
    while b"\r\n\r\n" not in resp:
        resp += sock.recv(4096)
    assert b"101" in resp.split(b"\r\n")[0]
    assert b"s3pPLMBiTxaQ9kYGzzhZRbK+xOo=" in resp  # RFC6455 sample accept
    return sock


def test_models_endpoint(server):
    host, _ = server
    data = json.loads(_get(host, "/api/models"))
    assert "MNIST_CNN" in data["models"]


def test_dashboard_served(server):
    host, _ = server
    page = _get(host, "/")
    assert b"deepflows_tpu" in page and b"WebSocket" in page


def test_build_dynamic_model():
    model = build_dynamic_model(
        [
            {"type": "Conv2d", "in_channels": 1, "out_channels": 4, "kernel_size": 3, "padding": 1},
            {"type": "ReLU"},
            {"type": "MaxPool2d", "kernel_size": 2},
            {"type": "Flatten"},
            {"type": "Linear", "in_features": 4 * 14 * 14, "out_features": 10},
        ],
        device="tpu",
    )
    from deepflows_tpu import Tensor

    x = Tensor(np.zeros((2, 1, 28, 28), np.float32), device="tpu")
    assert model(x).shape == (2, 10)


def test_ws_broadcast(server):
    host, srv = server
    sock = _ws_connect(host)
    deadline = time.time() + 10
    while not srv.manager.connections and time.time() < deadline:
        time.sleep(0.05)
    assert srv.manager.connections
    srv.manager.broadcast({"type": "status", "data": "hello"})
    sock.settimeout(20)
    seen = None
    for _ in range(10):  # resource-monitor frames may interleave
        opcode, payload = read_frame(sock)
        assert opcode == 1
        msg = json.loads(payload)
        if msg["type"] == "status":
            seen = msg
            break
    assert seen == {"type": "status", "data": "hello"}
    # client close is answered
    sock.sendall(encode_frame(b"", 0x8)[:1] + bytes([0x80]) + b"\x00\x00\x00\x00")
    sock.close()


def test_full_training_cycle(server):
    host, srv = server
    sock = _ws_connect(host)
    sock.settimeout(120)
    resp = _post(host, "/api/train/start", {"epochs": 1, "num_samples": 256, "batch_size": 32})
    assert resp["status"] == "started"
    # second start is rejected while running
    got_metrics = False
    deadline = time.time() + 110
    while time.time() < deadline:
        frame = read_frame(sock)
        if frame is None:
            break
        _, payload = frame
        msg = json.loads(payload)
        if msg["type"] == "metrics":
            d = msg["data"]
            assert {"epoch", "batch", "loss", "accuracy"} <= set(d)
            assert np.isfinite(d["loss"])
            got_metrics = True
            break
    assert got_metrics
    _post(host, "/api/train/stop")
    deadline = time.time() + 60
    while srv.state.flags["running"] and time.time() < deadline:
        time.sleep(0.2)
    assert not srv.state.flags["running"]
    sock.close()


def test_model_validate_endpoint(server):
    host, _ = server
    layers = [
        {"type": "Conv2d", "in_channels": 1, "out_channels": 8,
         "kernel_size": 3, "padding": 1},
        {"type": "MaxPool2d", "kernel_size": 2, "stride": 2},
        {"type": "Flatten"},
        {"type": "Linear", "in_features": 8 * 14 * 14, "out_features": 10},
    ]
    resp = _post(host, "/api/model/validate",
                 {"layers": layers, "input_shape": [1, 28, 28]})
    assert resp["ok"]
    shapes = [s["output_shape"] for s in resp["shapes"]]
    assert shapes == [[1, 8, 28, 28], [1, 8, 14, 14], [1, 1568], [1, 10]]
    # a broken model reports the error instead of 500ing
    bad = _post(host, "/api/model/validate",
                {"layers": [{"type": "Linear", "in_features": 3,
                             "out_features": 2}],
                 "input_shape": [1, 28, 28]})
    assert not bad["ok"] and bad["error"]


def test_history_and_epoch_message(server):
    host, srv = server
    sock = _ws_connect(host)
    sock.settimeout(120)
    _post(host, "/api/train/start",
          {"epochs": 1, "num_samples": 256, "batch_size": 32,
           "scheduler": "cosine", "weight_decay": 1e-4})
    got_epoch = False
    deadline = time.time() + 110
    while time.time() < deadline:
        frame = read_frame(sock)
        if frame is None:
            break
        _, payload = frame
        msg = json.loads(payload)
        if msg["type"] == "epoch":
            assert {"epoch", "test_acc", "lr", "epoch_time"} <= set(msg["data"])
            got_epoch = True
        if msg["type"] == "status" and msg["data"] in ("finished", "stopped"):
            break
    assert got_epoch
    deadline = time.time() + 30
    while srv.state.flags["running"] and time.time() < deadline:
        time.sleep(0.2)
    runs = json.loads(_get(host, "/api/history"))["runs"]
    assert runs and runs[-1]["outcome"] in ("finished", "stopped")
    assert runs[-1]["test_acc"] is not None
    sock.close()


def test_dynamic_model_transformer_layers():
    """The builder covers the round-2 nn surface (LayerNorm/GroupNorm/MHA/
    ReLU6/GELU/AvgPool2d)."""
    import numpy as np

    from deepflows_tpu import Tensor
    from deepflows_tpu.viz.server import build_dynamic_model

    m = build_dynamic_model(
        [
            {"type": "Linear", "in_features": 16, "out_features": 32},
            {"type": "LayerNorm", "normalized_shape": 32},
            {"type": "GELU"},
            {"type": "MultiheadAttention", "embed_dim": 32, "num_heads": 2},
            {"type": "Linear", "in_features": 32, "out_features": 4},
        ],
        device="tpu",
    )
    out = m(Tensor(np.zeros((2, 5, 16), np.float32), device="tpu"))
    assert out.shape == (2, 5, 4)

    # the image->tokens path the dashboard can now build: Flatten ->
    # Linear -> Reshape (B, L, E) -> causal MHA
    m3 = build_dynamic_model(
        [
            {"type": "Flatten"},
            {"type": "Linear", "in_features": 64, "out_features": 96},
            {"type": "Reshape", "shape": [3, 32]},
            {"type": "MultiheadAttention", "embed_dim": 32, "num_heads": 2,
             "causal": True},
            {"type": "Flatten"},
            {"type": "Linear", "in_features": 96, "out_features": 10},
        ],
        device="tpu",
    )
    out3 = m3(Tensor(np.zeros((2, 1, 8, 8), np.float32), device="tpu"))
    assert out3.shape == (2, 10)

    m2 = build_dynamic_model(
        [
            {"type": "Conv2d", "in_channels": 3, "out_channels": 4, "padding": 1},
            {"type": "GroupNorm", "num_groups": 2, "num_channels": 4},
            {"type": "ReLU6"},
            {"type": "AvgPool2d"},
        ],
        device="tpu",
    )
    out2 = m2(Tensor(np.zeros((2, 3, 8, 8), np.float32), device="tpu"))
    assert out2.shape == (2, 4, 4, 4)
