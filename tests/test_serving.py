"""Serving tests: real gRPC round-trip on localhost, backed by framework
inference (the reference served via ONNXRuntime; `serving.py:61-68`)."""

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, Tensor, nn

grpc = pytest.importorskip("grpc")

from deepflows_tpu.serving import MyDLPWServicer, PredictClient  # noqa: E402


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def test_grpc_predict_roundtrip():
    df.manual_seed(0)
    model = nn.Sequential(
        nn.Linear(8, 16, device="tpu"), nn.ReLU(), nn.Linear(16, 3, device="tpu")
    )
    server = MyDLPWServicer("localhost:50911", model=model)
    server.serve(wait=False)
    try:
        client = PredictClient("localhost:50911")
        x = np.random.default_rng(0).standard_normal((4, 8)).astype(np.float32)
        (out,) = client.predict(x)
        model.eval()
        want = model(Tensor(x, device="tpu")).numpy()
        model.train()
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)
        # two matrices in one request
        outs = client.predict(x, x * 2)
        assert len(outs) == 2
        client.close()
    finally:
        server.stop()
