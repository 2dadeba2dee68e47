"""gRPC serving demo (reference: `DF_serving/server.py` + `client.py`):
start a Predict server, query it with the client.  Two modes:

- live in-process model (default);
- ``--export-onnx``: export the model to an .onnx file first, then serve
  THAT file from disk — the reference's deployment shape
  (`DF_serving/serving/serving.py:25,61-68` runs an onnx file from
  root_dir/model_file)."""

from __future__ import annotations

import argparse
import os
import tempfile
import time

import numpy as np

import deepflows_tpu as df
from deepflows_tpu import models
from deepflows_tpu.serving import MyDLPWServicer, PredictClient


def main(host="localhost:50051", export_onnx=False):
    df.manual_seed(0)
    model = models.MNIST_CNN(device="tpu")
    if export_onnx:
        from deepflows_tpu.onnx import check_onnx
        from deepflows_tpu.onnx import export_onnx as export

        root = tempfile.mkdtemp()
        sample = np.zeros((1, 1, 28, 28), np.float32)
        export(model, sample, os.path.join(root, "mnist_cnn.onnx"))
        print("exported:", check_onnx(os.path.join(root, "mnist_cnn.onnx")))
        server = MyDLPWServicer(host, root_dir=root, model_file="mnist_cnn.onnx")
        print(f"serving {root}/mnist_cnn.onnx from disk on {host}")
    else:
        server = MyDLPWServicer(host, model=model)
        print(f"serving MNIST_CNN (live) on {host}")
    server.serve(wait=False)
    time.sleep(0.2)

    client = PredictClient(host)
    x = np.random.default_rng(0).standard_normal((4, 1, 28, 28)).astype(np.float32)
    (logits,) = client.predict(x)
    print("predictions:", logits.argmax(1))
    client.close()
    server.stop()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="localhost:50051")
    p.add_argument("--export-onnx", action="store_true")
    args = p.parse_args()
    main(args.host, args.export_onnx)
