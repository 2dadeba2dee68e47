"""Subprocess runner: forward the REFERENCE framework (NumPy backend) on
the reference's committed trained CIFAR-10 checkpoint and dump the logits.

Invoked by ``test_reference_checkpoints.py``'s cross-framework A/B test:
this process imports the reference's own ``DeepFlows`` package from
``/root/reference`` (NOT the repo's compatibility shim — the path insert
below shadows it), rebuilds the trained architecture of
`/root/reference/test/CNN_CIFAR10_cuda.py:61-108` on the reference's
numpy device, restores the .pkl with the reference's OWN
`utils/model_utils.py:85-181` loader, injects the BN running statistics
passed in (the pickle carries none — reference save iterates only
named_parameters), and evaluates a fixed input batch.

Protocol pins (mirrored by the deepflows_tpu side of the test):
- dropout p=0: the reference's eval-mode Dropout returns ``x * (1 - p)``
  (`nn/modules/dropout.py:33` — a documented reference bug deepflows_tpu
  fixes), so the comparison zeroes p on BOTH sides;
- eval mode: BN normalizes with the injected running stats on both sides.

Usage: python ref_logits_runner.py <input.npz> <out_logits.npy>
where input.npz has arrays: x (B,3,32,32) f32, bn_means/bn_vars (lists of
(C,) f32 per BN layer, keys mean1..mean3 / var1..var3).
"""
import sys

sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402


def main(inp_path: str, out_path: str) -> None:
    from DeepFlows import backend_api, nn  # the REFERENCE package
    from DeepFlows.tensor import Tensor
    from DeepFlows.utils.model_utils import load_checkpoint

    assert nn.__file__.startswith("/root/reference/"), nn.__file__

    class CIFAR10_CNN(nn.Module):
        # the trained architecture, device 'cpu' (numpy backend)
        def __init__(self, num_classes=10):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 32, kernel_size=5, padding=2, device="cpu")
            self.bn1 = nn.BatchNorm2d(32, device="cpu")
            self.relu1 = nn.ReLU()
            self.pool1 = nn.MaxPool2d(kernel_size=2, stride=2)
            self.conv2 = nn.Conv2d(32, 64, kernel_size=5, padding=2, device="cpu")
            self.bn2 = nn.BatchNorm2d(64, device="cpu")
            self.relu2 = nn.ReLU()
            self.pool2 = nn.MaxPool2d(kernel_size=2, stride=2)
            self.conv3 = nn.Conv2d(64, 128, kernel_size=3, padding=1, device="cpu")
            self.bn3 = nn.BatchNorm2d(128, device="cpu")
            self.relu3 = nn.ReLU()
            self.pool3 = nn.MaxPool2d(kernel_size=2, stride=2)
            self.drop = nn.Dropout(0.0)  # see protocol pin above
            self.fc = nn.Linear(128 * 4 * 4, num_classes, device="cpu")

        def forward(self, x):
            x = self.pool1(self.relu1(self.bn1(self.conv1(x))))
            x = self.pool2(self.relu2(self.bn2(self.conv2(x))))
            x = self.pool3(self.relu3(self.bn3(self.conv3(x))))
            x = x.reshape(x.shape[0], -1)
            x = self.drop(x)
            x = self.fc(x)
            return x

    data = np.load(inp_path)
    model = CIFAR10_CNN()
    ckpt = "/root/reference/test/checkpoints-cifar10cuda_70%/cifar10_cnn_cuda_checkpoint.pkl"
    load_checkpoint(model, None, ckpt)
    dev = backend_api.Device("cpu")
    for i, bn in enumerate((model.bn1, model.bn2, model.bn3), start=1):
        c = bn.running_mean.shape[1]
        bn.running_mean.data = backend_api.Btensor(
            data[f"mean{i}"].reshape(1, c, 1, 1).astype(np.float32),
            dtype="float32", device=dev,
        )
        bn.running_var.data = backend_api.Btensor(
            data[f"var{i}"].reshape(1, c, 1, 1).astype(np.float32),
            dtype="float32", device=dev,
        )
    model.eval()
    x = Tensor(np.ascontiguousarray(data["x"]), device=dev)
    logits = model(x)
    np.save(out_path, np.asarray(logits.numpy(), np.float32))
    print("ref logits saved", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
