"""Live-training visualization backend (reference:
`Visualization_backend/server.py`, FastAPI + WebSocket + Vue frontend).

Same HTTP/WS contract on stdlib http.server (FastAPI is absent here):

- ``POST /api/train/start`` {model?, optimizer?, learning_rate?, epochs?,
  batch_size?, layers?} → starts a daemon training thread
- ``POST /api/train/stop`` → sets the stop flag (checked per batch)
- ``GET  /api/models``     → available model names
- ``GET  /``               → built-in single-file dashboard (replaces the
  reference's Vue app; no node build needed)
- ``WS   /ws``             → pushes ``{type: "metrics", data: {epoch, batch,
  loss, accuracy}}`` every 10 batches, ``{type: "resources", data: {...}}``
  at 1 Hz (psutil), and ``{type: "status", data: ...}`` transitions —
  message shapes per the reference (`server.py:348-357,159-166`).

Training runs a real deepflows_tpu loop on the TPU device.  Data: OpenML
MNIST when the network allows (like the reference), else sklearn's bundled
digits dataset upscaled — keeps the platform fully offline-capable.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from .websocket import WSConnection, perform_handshake

from .frontend import DASHBOARD_HTML as _DASHBOARD_HTML


class ConnectionManager:
    """Track live WS connections; broadcast JSON; 1 Hz resource monitor
    (reference `server.py:118-171`)."""

    def __init__(self):
        self.connections: list[WSConnection] = []
        self._lock = threading.Lock()
        self._monitoring = False

    def register(self, conn: WSConnection):
        with self._lock:
            self.connections.append(conn)

    def broadcast(self, message: dict):
        with self._lock:
            conns = list(self.connections)
        for c in conns:
            if not c.send_json(message):
                with self._lock:
                    if c in self.connections:
                        self.connections.remove(c)

    def start_monitoring(self):
        if self._monitoring:
            return
        self._monitoring = True

        def loop():
            try:
                import psutil
            except ImportError:
                return
            while self._monitoring:
                self.broadcast(
                    {
                        "type": "resources",
                        "data": {
                            "cpu_percent": psutil.cpu_percent(),
                            "memory_percent": psutil.virtual_memory().percent,
                        },
                    }
                )
                time.sleep(1.0)

        threading.Thread(target=loop, daemon=True).start()

    def stop_monitoring(self):
        self._monitoring = False


def build_dynamic_model(layers, device=None):
    """JSON layer list → model (reference `server.py:191-238`); supported
    types: Conv2d, ReLU, MaxPool2d, Flatten, Linear, Dropout, BatchNorm2d."""
    from .. import nn

    mods = []
    for spec in layers:
        t = spec["type"]
        if t == "Conv2d":
            mods.append(
                nn.Conv2d(
                    spec["in_channels"],
                    spec["out_channels"],
                    spec.get("kernel_size", 3),
                    spec.get("stride", 1),
                    spec.get("padding", 0),
                    device=device,
                )
            )
        elif t == "ReLU":
            mods.append(nn.ReLU())
        elif t == "MaxPool2d":
            mods.append(nn.MaxPool2d(spec.get("kernel_size", 2), spec.get("stride", 2)))
        elif t == "Flatten":
            mods.append(nn.Flatten())
        elif t == "Linear":
            mods.append(
                nn.Linear(spec["in_features"], spec["out_features"], device=device)
            )
        elif t == "Dropout":
            mods.append(nn.Dropout(spec.get("p", 0.5)))
        elif t == "BatchNorm2d":
            mods.append(nn.BatchNorm2d(spec["num_features"], device=device))
        else:
            raise ValueError(f"unsupported layer type {t}")
    return nn.Sequential(*mods)


def _load_mnist(limit=3000):
    """OpenML MNIST like the reference (`server.py:269-280`); offline
    fallback: sklearn bundled digits upscaled 8×8→24×24, padded to 28×28."""
    try:
        import socket

        # fast offline probe: fetch_openml's retries hang on dropped SYNs
        socket.create_connection(("www.openml.org", 443), timeout=2).close()
        from sklearn.datasets import fetch_openml

        mnist = fetch_openml("mnist_784", version=1, as_frame=False, parser="auto")
        x = mnist.data[:limit].astype(np.float32).reshape(-1, 1, 28, 28) / 255.0
        y = mnist.target[:limit].astype(np.int32)
        return x, y
    except Exception:
        from sklearn.datasets import load_digits

        d = load_digits()
        x8 = d.images.astype(np.float32) / 16.0  # (N,8,8)
        x24 = np.kron(x8, np.ones((1, 3, 3), dtype=np.float32))
        x = np.pad(x24, ((0, 0), (2, 2), (2, 2)))[:, None]
        return x[:limit], d.target[:limit].astype(np.int32)


class TrainingState:
    def __init__(self):
        self.flags = {"running": False, "stop": False}
        self.thread: Optional[threading.Thread] = None


def train_worker(manager: ConnectionManager, state: TrainingState, config: dict):
    """Real training loop pushing metrics (reference `server.py:263-383`)."""
    import deepflows_tpu as df
    from .. import nn, optim
    from ..jit import CompiledTrainStep
    from ..utils.data import data_loader

    try:
        manager.broadcast({"type": "status", "data": "loading data"})
        x, y = _load_mnist(limit=int(config.get("num_samples", 3000)))
        device = config.get("device", "tpu")
        layers = config.get("layers")
        if layers:
            model = build_dynamic_model(layers, device=device)
        else:
            from ..models import MNIST_CNN

            model = MNIST_CNN(device=device)
        lr = float(config.get("learning_rate", 1e-3))
        opt_name = str(config.get("optimizer", "adam")).lower()
        opts = {
            "adam": lambda p: optim.Adam(p, lr=lr),
            "sgd": lambda p: optim.SGD(p, lr=lr, momentum=0.9),
            "adagrad": lambda p: optim.Adagrad(p, lr=lr),
            "adadelta": lambda p: optim.Adadelta(p, lr=lr),
        }
        opt = opts.get(opt_name, opts["adam"])(model.parameters())

        def metrics_fn(out, yt):
            pred = out.argmax(1)
            return {"acc": (pred.data.array == yt.data.array).mean()}

        step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss(), metrics_fn=metrics_fn)
        bs = int(config.get("batch_size", 64))
        epochs = int(config.get("epochs", 3))
        manager.broadcast({"type": "status", "data": "training"})
        for epoch in range(epochs):
            loader = data_loader(x, y, bs, shuffle=True, drop_last=True)
            for i, (xb, yb) in enumerate(loader):
                if state.flags["stop"]:
                    manager.broadcast({"type": "status", "data": "stopped"})
                    return
                loss = step(xb, yb)
                if i % 10 == 0:
                    manager.broadcast(
                        {
                            "type": "metrics",
                            "data": {
                                "epoch": epoch,
                                "batch": i,
                                "loss": float(loss),
                                "accuracy": float(step._last_metrics["acc"]),
                            },
                        }
                    )
        manager.broadcast({"type": "status", "data": "finished"})
    except Exception as e:  # surface errors to the dashboard
        manager.broadcast({"type": "status", "data": f"error: {e}"})
    finally:
        state.flags["running"] = False
        df.set_grad_enabled(True)


AVAILABLE_MODELS = ["MNIST_CNN", "dynamic"]


def make_server(host: str = "0.0.0.0", port: int = 8000) -> ThreadingHTTPServer:
    manager = ConnectionManager()
    state = TrainingState()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/ws":
                if not perform_handshake(self):
                    return
                conn = WSConnection(self.connection)
                manager.register(conn)
                manager.start_monitoring()
                conn.serve_reads()  # blocks this handler thread
                return
            if self.path in ("/", "/index.html"):
                body = _DASHBOARD_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if self.path == "/api/models":
                self._json({"models": AVAILABLE_MODELS})
                return
            self._json({"error": "not found"}, 404)

        def do_POST(self):
            n = int(self.headers.get("Content-Length") or 0)
            raw = self.rfile.read(n) if n else b"{}"
            try:
                config = json.loads(raw or b"{}")
            except json.JSONDecodeError:
                self._json({"error": "bad json"}, 400)
                return
            if self.path == "/api/train/start":
                if state.flags["running"]:
                    self._json({"status": "already running"}, 409)
                    return
                state.flags.update(running=True, stop=False)
                state.thread = threading.Thread(
                    target=train_worker, args=(manager, state, config), daemon=True
                )
                state.thread.start()
                self._json({"status": "started"})
                return
            if self.path == "/api/train/stop":
                state.flags["stop"] = True
                self._json({"status": "stopping"})
                return
            self._json({"error": "not found"}, 404)

    server = ThreadingHTTPServer((host, port), Handler)
    server.manager = manager  # type: ignore[attr-defined]
    server.state = state  # type: ignore[attr-defined]
    return server


def main(host="0.0.0.0", port=8000):
    server = make_server(host, port)
    print(f"deepflows_tpu viz backend on http://{host}:{port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
