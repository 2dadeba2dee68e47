"""Cross-framework trajectory parity at reduced scale (full-scale tables:
docs/TRAJECTORY_AB_*.md, harness: examples/parity_trajectory.py).

Both reference recipes (CIFAR10_CNN Adam+cosine, ResNet18 SGD+StepLR) are
trained A/B against hand-written torch twins with identical init, identical
shuffled+flipped batch streams and per-epoch state re-sync; per-epoch train
loss must agree to <1% and test accuracy to <1pp."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_BOOTSTRAP = """
import jax; jax.config.update('jax_platforms','cpu')
import sys; sys.path.insert(0, {examples!r})
import parity_trajectory as pt
ours, theirs, ok = pt.main({model!r}, exact=True, limit={limit}, epochs={epochs})
assert ok
print('PARITY_OK')
"""


def _run(model, limit, epochs, timeout=540):
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    code = _BOOTSTRAP.format(
        examples=os.path.join(ROOT, "examples"), model=model, limit=limit,
        epochs=epochs,
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=os.path.join(ROOT, "examples"),
    )
    assert proc.returncode == 0, f"{model} A/B failed:\n{proc.stdout}\n{proc.stderr}"
    assert "PARITY_OK" in proc.stdout
    return proc.stdout


@pytest.mark.slow
def test_cifar10_cnn_trajectory_parity():
    _run("cifar10_cnn", limit=512, epochs=3)


@pytest.mark.slow
def test_resnet18_trajectory_parity():
    _run("resnet18", limit=256, epochs=2)


@pytest.mark.slow
def test_cifar10_cnn_full_recipe_shared_masks_parity():
    """FULL recipe (dropout ON): the torch twin replays the framework's
    on-device dropout stream bit-for-bit (SharedMaskDropout), so even the
    dropout path asserts the 1%/1pp criteria — no escape hatch."""
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    code = _BOOTSTRAP.replace("exact=True", "exact=False").format(
        examples=os.path.join(ROOT, "examples"), model="cifar10_cnn",
        limit=512, epochs=3,
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=540, env=env, cwd=os.path.join(ROOT, "examples"),
    )
    assert proc.returncode == 0, f"full-recipe A/B failed:\n{proc.stdout}\n{proc.stderr}"
    assert "PARITY_OK" in proc.stdout


@pytest.mark.slow
def test_cnn_mnist_real_data_trajectory_parity():
    """REAL-DATA parity: the reference repo ships the 10k-image MNIST test
    set offline; the cnn_mnist recipe (Adam 1e-3, bs 64) must track its
    torch twin on real digits."""
    _run("cnn_mnist", limit=2000, epochs=2)
