"""Live-training visualization backend (reference:
`Visualization_backend/server.py`, FastAPI + WebSocket + Vue frontend).

Same HTTP/WS contract on stdlib http.server (FastAPI is absent here):

- ``POST /api/train/start`` {model?, optimizer?, scheduler?, learning_rate?,
  weight_decay?, epochs?, batch_size?, num_samples?, target_acc?, layers?}
  → starts a daemon training thread
- ``POST /api/train/stop``     → sets the stop flag (checked per batch)
- ``POST /api/model/validate`` {layers, input_shape?} → builds the dynamic
  model and returns per-layer output shapes (live feedback for the builder)
- ``GET  /api/models``         → available model names
- ``GET  /api/history``        → finished-run summaries (config, final
  loss/accuracy, wall time, outcome)
- ``GET  /``                   → the SPA shell (``viz/static/index.html``);
  ``/js/*`` and ``/css/*`` serve the ES-module frontend from
  ``viz/static/`` (replaces the reference's Vue 3 + Vite app with the same
  store/router/api/views architecture, native modules, no node build)
- ``WS   /ws``                 → pushes ``{type: "metrics", data: {epoch,
  batch, loss, accuracy}}`` every 10 batches, ``{type: "resources"}`` at
  1 Hz (psutil), ``{type: "status"}`` transitions — message shapes per the
  reference (`server.py:348-357,159-166`) — plus a superset
  ``{type: "epoch", data: {epoch, test_acc, lr, epoch_time}}`` per epoch.

Training runs a real deepflows_tpu loop on the TPU device.  Data: OpenML
MNIST when the network allows (like the reference), else sklearn's bundled
digits dataset upscaled — keeps the platform fully offline-capable.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Optional

import numpy as np

from .websocket import WSConnection, perform_handshake

STATIC_ROOT = Path(__file__).resolve().parent / "static"

_CONTENT_TYPES = {
    ".html": "text/html; charset=utf-8",
    ".js": "text/javascript; charset=utf-8",
    ".css": "text/css; charset=utf-8",
    ".json": "application/json",
    ".svg": "image/svg+xml",
    ".png": "image/png",
    ".ico": "image/x-icon",
}


def resolve_static(url_path: str) -> Optional[Path]:
    """Map a URL path onto ``viz/static/``, refusing traversal outside it.
    ``/`` serves the SPA shell; unknown extensions are refused."""
    if url_path in ("/", "/index.html"):
        return STATIC_ROOT / "index.html"
    candidate = (STATIC_ROOT / url_path.lstrip("/")).resolve()
    if (
        STATIC_ROOT not in candidate.parents
        or candidate.suffix not in _CONTENT_TYPES
        or not candidate.is_file()
    ):
        return None
    return candidate


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
    types: Conv2d, ReLU, ReLU6, GELU, MaxPool2d, AvgPool2d, Flatten,
    Reshape, Linear, Dropout, BatchNorm2d, LayerNorm, GroupNorm,
    MultiheadAttention — a superset of the reference's seven (Reshape
    makes rank-3 token sequences buildable for MHA)."""
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
        elif t == "ReLU6":
            mods.append(nn.ReLU6())
        elif t == "GELU":
            mods.append(nn.GELU())
        elif t == "AvgPool2d":
            mods.append(nn.AvgPool2d(spec.get("kernel_size", 2), spec.get("stride", 2)))
        elif t == "LayerNorm":
            mods.append(nn.LayerNorm(spec["normalized_shape"], device=device))
        elif t == "GroupNorm":
            mods.append(
                nn.GroupNorm(
                    spec["num_groups"], spec["num_channels"], device=device
                )
            )
        elif t == "MultiheadAttention":
            mods.append(
                nn.MultiheadAttention(
                    spec["embed_dim"],
                    spec["num_heads"],
                    causal=spec.get("causal", False),
                    device=device,
                )
            )
        elif t == "Reshape":
            shape = tuple(spec["shape"])

            class _Reshape(nn.Module):
                def forward(self, x, _shape=shape):
                    return x.reshape((x.shape[0],) + _shape)

            mods.append(_Reshape())
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


def infer_layer_shapes(layers, input_shape):
    """Per-layer output shapes for the model-builder preview: builds the
    dynamic model on the numpy CPU device and runs one zeros batch through
    each layer (superset of the reference, whose builder had no feedback)."""
    from ..tensor import Tensor
    from ..autograd import no_grad

    model = build_dynamic_model(layers, device="cpu")
    x = Tensor(np.zeros((1, *input_shape), np.float32), device="cpu")
    shapes = []
    with no_grad():
        for spec, mod in zip(layers, model):
            x = mod(x)
            shapes.append({"type": spec["type"], "output_shape": list(x.shape)})
    return shapes


class TrainingState:
    def __init__(self):
        self.flags = {"running": False, "stop": False}
        self.thread: Optional[threading.Thread] = None
        self.history: list[dict] = []  # finished-run summaries


def train_worker(manager: ConnectionManager, state: TrainingState, config: dict):
    """Real training loop pushing metrics (reference `server.py:263-383`)."""
    import deepflows_tpu as df
    from .. import nn, optim
    from ..jit import CompiledTrainStep
    from ..utils.data import data_loader

    from ..jit import CompiledEvalStep

    t_run = time.time()
    summary = {"config": {k: v for k, v in config.items() if k != "layers"},
               "started": time.strftime("%H:%M:%S"), "final_loss": None,
               "test_acc": None, "epochs_run": 0, "outcome": "error"}
    try:
        manager.broadcast({"type": "status", "data": "loading data"})
        x, y = _load_mnist(limit=int(config.get("num_samples", 3000)))
        n_test = max(1, len(x) // 6)
        x, x_test = x[:-n_test], x[-n_test:]
        y, y_test = y[:-n_test], y[-n_test:]
        device = config.get("device", "tpu")
        layers = config.get("layers")
        model_name = str(config.get("model", "MNIST_CNN"))
        if layers:
            model = build_dynamic_model(layers, device=device)
        elif model_name == "MLP":
            from ..models import MLP

            model = MLP(device=device)
        else:
            from ..models import MNIST_CNN

            model = MNIST_CNN(device=device)
        lr = float(config.get("learning_rate", 1e-3))
        wd = float(config.get("weight_decay", 0.0))
        opt_name = str(config.get("optimizer", "adam")).lower()
        opts = {
            "adam": lambda p: optim.Adam(p, lr=lr, weight_decay=wd),
            "sgd": lambda p: optim.SGD(p, lr=lr, momentum=0.9, weight_decay=wd),
            "adagrad": lambda p: optim.Adagrad(p, lr=lr),
            "adadelta": lambda p: optim.Adadelta(p, lr=lr),
            "adamw": lambda p: optim.AdamW(p, lr=lr, weight_decay=wd),
            "rmsprop": lambda p: optim.RMSprop(p, lr=lr, weight_decay=wd),
            "adafactor": lambda p: optim.Adafactor(p, lr=lr, weight_decay=wd),
            "lion": lambda p: optim.Lion(p, lr=lr, weight_decay=wd),
            "muon": lambda p: optim.Muon(p, lr=lr, weight_decay=wd),
        }
        opt = opts.get(opt_name, opts["adam"])(model.parameters())
        epochs = int(config.get("epochs", 3))
        sch_name = str(config.get("scheduler", "none")).lower()
        scheduler = None
        if sch_name == "step":
            scheduler = optim.StepLR(opt, step_size=max(1, epochs // 3), gamma=0.5)
        elif sch_name == "cosine":
            scheduler = optim.CosineAnnealingLR(opt, T_max=epochs)
        target_acc = config.get("target_acc")

        def metrics_fn(out, yt):
            pred = out.argmax(1)
            return {"acc": (pred.data.array == yt.data.array).mean()}

        step = CompiledTrainStep(model, opt, nn.CrossEntropyLoss(), metrics_fn=metrics_fn)
        ev = CompiledEvalStep(model)

        def test_accuracy():
            correct = 0
            for b in range(0, len(x_test), 256):
                pred = np.asarray(ev(x_test[b : b + 256])).argmax(1)
                correct += int((pred == y_test[b : b + 256]).sum())
            return correct / len(x_test)

        bs = int(config.get("batch_size", 64))
        manager.broadcast({"type": "status", "data": "training"})
        last_loss = float("nan")
        for epoch in range(epochs):
            t0 = time.time()
            loader = data_loader(x, y, bs, shuffle=True, drop_last=True,
                                 prefetch_size=2)
            for i, (xb, yb) in enumerate(loader):
                if state.flags["stop"]:
                    summary["outcome"] = "stopped"
                    manager.broadcast({"type": "status", "data": "stopped"})
                    return
                loss = step(xb, yb)
                if i % 10 == 0:
                    last_loss = float(loss)
                    manager.broadcast(
                        {
                            "type": "metrics",
                            "data": {
                                "epoch": epoch,
                                "batch": i,
                                "loss": last_loss,
                                "accuracy": float(step._last_metrics["acc"]),
                            },
                        }
                    )
            acc = test_accuracy()
            summary.update(
                final_loss=last_loss, test_acc=acc, epochs_run=epoch + 1
            )
            # superset message (reference pushes only metrics/resources/status)
            manager.broadcast(
                {
                    "type": "epoch",
                    "data": {
                        "epoch": epoch,
                        "test_acc": acc,
                        "lr": float(opt.lr),
                        "epoch_time": time.time() - t0,
                    },
                }
            )
            if scheduler is not None:
                scheduler.step()
            if target_acc is not None and acc * 100.0 >= float(target_acc):
                summary["outcome"] = "target reached"
                manager.broadcast(
                    {"type": "status", "data": f"target {target_acc}% reached"}
                )
                return
        summary["outcome"] = "finished"
        manager.broadcast({"type": "status", "data": "finished"})
    except Exception as e:  # surface errors to the dashboard
        summary["outcome"] = f"error: {e}"
        manager.broadcast({"type": "status", "data": f"error: {e}"})
    finally:
        summary["wall_time"] = round(time.time() - t_run, 2)
        state.history.append(summary)
        state.flags["running"] = False
        df.set_grad_enabled(True)


AVAILABLE_MODELS = ["MNIST_CNN", "MLP", "dynamic"]


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
            if not self.path.startswith("/api/"):
                static = resolve_static(self.path.split("?", 1)[0])
                if static is None:
                    self._json({"error": "not found"}, 404)
                    return
                body = static.read_bytes()
                self.send_response(200)
                self.send_header("Content-Type", _CONTENT_TYPES[static.suffix])
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if self.path == "/api/models":
                self._json({"models": AVAILABLE_MODELS})
                return
            if self.path == "/api/history":
                self._json({"runs": state.history})
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
            if self.path == "/api/model/validate":
                try:
                    shapes = infer_layer_shapes(
                        config.get("layers") or [],
                        tuple(config.get("input_shape", (1, 28, 28))),
                    )
                    self._json({"ok": True, "shapes": shapes})
                except Exception as e:
                    self._json({"ok": False, "error": str(e)})
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
