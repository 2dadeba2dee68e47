"""gRPC serving demo (reference: `DF_serving/server.py` + `client.py`):
start a Predict server on a trained model, query it with the client."""

from __future__ import annotations

import argparse
import time

import numpy as np

import deepflows_tpu as df
from deepflows_tpu import models
from deepflows_tpu.serving import MyDLPWServicer, PredictClient


def main(host="localhost:50051"):
    df.manual_seed(0)
    model = models.MNIST_CNN(device="tpu")
    server = MyDLPWServicer(host, model=model)
    server.serve(wait=False)
    print(f"serving MNIST_CNN on {host}")
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
    main(p.parse_args().host)
