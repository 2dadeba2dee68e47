"""Autograd tape unit tests: finite-difference gradient checks per op,
cross-device consistency, grad-mode contexts, tape memory management.

This is the unit-test tier the reference lacks (SURVEY.md §4): every op's
gradient is checked against central finite differences on the CPU device and
for agreement across devices.
"""

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Tensor, Graph, no_grad, enable_grad


def numeric_grad(f, x, eps=1e-3):
    """Central finite differences of scalar f at numpy array x."""
    g = np.zeros_like(x, dtype=np.float64)
    flat = x.reshape(-1)
    gf = g.reshape(-1)
    for i in range(flat.size):
        old = flat[i]
        flat[i] = old + eps
        fp = f(x.astype(np.float32))
        flat[i] = old - eps
        fm = f(x.astype(np.float32))
        flat[i] = old
        gf[i] = (fp - fm) / (2 * eps)
    return g


def check_op(build, x_np, device="cpu", rtol=2e-2, atol=1e-3):
    """build(tensor) -> scalar Tensor; compares tape grad to finite diff."""
    x = Tensor(x_np.copy(), device=device, requires_grad=True)
    loss = build(x)
    loss.backward()
    got = x.grad.numpy()

    def f(a):
        with no_grad():
            t = Tensor(a, device=device)
        # rebuild graph without grads for the numeric eval
        with enable_grad():
            pass
        out = build(Tensor(a, device=device))
        return float(out.numpy())

    want = numeric_grad(f, x_np.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)
    Graph.free_graph_all()


RNG = np.random.default_rng(0)
X23 = RNG.standard_normal((2, 3)).astype(np.float32)
POS = (np.abs(X23) + 0.5).astype(np.float32)


@pytest.mark.parametrize(
    "name,build,x",
    [
        ("add", lambda x: (x + 2.0).sum(), X23),
        ("sub", lambda x: (3.0 - x).sum(), X23),
        ("mul", lambda x: (x * x).sum(), X23),
        ("div", lambda x: (1.0 / (x + 10.0)).sum(), X23),
        ("pow", lambda x: (x**3.0).mean(), POS),
        ("exp", lambda x: df.exp(x).sum(), X23),
        ("log", lambda x: df.log(x).sum(), POS),
        ("abs", lambda x: df.abs(x).sum(), X23 + 0.3),
        ("sqrt", lambda x: df.sqrt(x).sum(), POS),
        ("mean_all", lambda x: x.mean(), X23),
        ("mean_axis", lambda x: x.mean(axis=0).sum(), X23),
        ("sum_keepdims", lambda x: x.sum(axis=1, keepdims=True).sum(), X23),
        ("max_all", lambda x: x.max(), X23),
        ("max_axis", lambda x: x.max(axis=1).sum(), X23),
        ("min_axis", lambda x: x.min(axis=0).sum(), X23),
        ("maximum", lambda x: df.maximum(x, 0.1).sum(), X23),
        ("reshape", lambda x: x.reshape(3, 2).sum(axis=0).max(), X23),
        ("transpose", lambda x: (x.T * x.T).sum(), X23),
        ("slice", lambda x: x[0, 1:].sum(), X23),
    ],
)
def test_op_grads_fd(name, build, x):
    check_op(build, x)


def test_matmul_grad_fd():
    a = RNG.standard_normal((2, 3)).astype(np.float32)
    b = RNG.standard_normal((3, 4)).astype(np.float32)
    ta = Tensor(a, requires_grad=True)
    tb = Tensor(b, requires_grad=True)
    (ta @ tb).sum().backward()
    ga, gb = ta.grad.numpy(), tb.grad.numpy()
    np.testing.assert_allclose(ga, np.ones((2, 4)) @ b.T, rtol=1e-4)
    np.testing.assert_allclose(gb, a.T @ np.ones((2, 4)), rtol=1e-4)


def test_matmul_batched_grad():
    a = RNG.standard_normal((5, 2, 3)).astype(np.float32)
    b = RNG.standard_normal((3, 4)).astype(np.float32)
    ta = Tensor(a, requires_grad=True)
    tb = Tensor(b, requires_grad=True)
    (ta @ tb).sum().backward()
    g = np.ones((5, 2, 4), np.float32)
    np.testing.assert_allclose(ta.grad.numpy(), g @ b.T, rtol=1e-4)
    np.testing.assert_allclose(
        tb.grad.numpy(), np.einsum("bij,bik->jk", a, g), rtol=1e-4, atol=1e-4
    )


def test_broadcast_grad_unbroadcast_on_device(device):
    x = Tensor(np.ones((4, 3), np.float32), device=device, requires_grad=True)
    b = Tensor(np.ones((1, 3), np.float32), device=device, requires_grad=True)
    ((x + b) * 2.0).sum().backward()
    np.testing.assert_allclose(b.grad.numpy(), np.full((1, 3), 8.0))
    np.testing.assert_allclose(x.grad.numpy(), np.full((4, 3), 2.0))


def test_cross_device_same_grads():
    a = RNG.standard_normal((3, 3)).astype(np.float32)
    grads = {}
    for dev in ("cpu", "tpu"):
        x = Tensor(a.copy(), device=dev, requires_grad=True)
        y = ((x @ x).mean() + df.exp(x * 0.1).sum())
        y.backward()
        grads[dev] = x.grad.numpy()
    np.testing.assert_allclose(grads["cpu"], grads["tpu"], rtol=1e-4, atol=1e-5)


def test_no_grad_blocks_tape():
    Graph.free_graph_all()
    with no_grad():
        x = Tensor(X23, requires_grad=True)
        y = x * 2.0
    assert not x.requires_grad
    assert not y.requires_grad
    assert len(Graph.node_list) == 0


def test_no_grad_as_decorator():
    @no_grad()
    def fn():
        t = Tensor(X23, requires_grad=True)
        return t.requires_grad

    assert fn() is False
    assert df.is_grad_enable()


def test_second_backward_with_retain_graph():
    x = Tensor(X23, requires_grad=True)
    y = (x * x).sum()
    y.backward(retain_graph=True)
    g1 = x.grad.numpy().copy()
    x.zero_grad()
    y.backward()
    np.testing.assert_allclose(x.grad.numpy(), g1)


def test_free_graph_keeps_leaves():
    Graph.free_graph_all()
    x = Tensor(X23, requires_grad=True)
    y = (x * 3.0).sum()
    y.backward()  # frees graph, keeps leaves
    assert any(n is x for n in Graph.node_list)
    assert all(n.is_leaf or n is x for n in Graph.node_list)
    Graph.free_graph_all()
    assert len(Graph.node_list) == 0


def test_dispose():
    Graph.free_graph_all()
    x = Tensor(X23, requires_grad=True)
    y = x * 2.0
    y.dispose()
    assert all(n is not y for n in Graph.node_list)
    Graph.free_graph_all()


def test_grad_accumulation():
    x = Tensor(X23, requires_grad=True)
    (x.sum() * 1.0).backward(retain_graph=True)
    (x.sum() * 1.0).backward()
    # second backward had a fresh graph segment; grads accumulate
    np.testing.assert_allclose(x.grad.numpy(), np.full((2, 3), 2.0))
    Graph.free_graph_all()


def test_inplace_forbidden_on_grad_nodes():
    x = Tensor(X23, requires_grad=True)
    with pytest.raises(AssertionError):
        x += 1.0
    with pytest.raises(AssertionError):
        x[0, 0] = 5.0
    Graph.free_graph_all()


def test_detach_and_comparisons():
    x = Tensor(X23, requires_grad=True)
    d = x.detach()
    assert not d.requires_grad
    c = x > 0
    assert not c.requires_grad
    np.testing.assert_allclose(c.numpy(), (X23 > 0).astype(np.float32))
    Graph.free_graph_all()


def test_concat_grad():
    a = Tensor(X23, requires_grad=True)
    b = Tensor(X23 * 2, requires_grad=True)
    y = df.concat([a, b], axis=1)
    assert y.shape == (2, 6)
    (y * y).sum().backward()
    np.testing.assert_allclose(a.grad.numpy(), 2 * X23, rtol=1e-5)
    np.testing.assert_allclose(b.grad.numpy(), 4 * X23 * 2 / 2, rtol=1e-5)
    Graph.free_graph_all()
