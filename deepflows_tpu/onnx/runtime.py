"""Minimal ONNX runtime over the framework's TPU kernels.

``OnnxModel(path)`` parses an ONNX file (ours, or a foreign one using the
supported op set) and executes it as a jitted JAX program — this is what lets
the serving layer load a model FILE from disk like the reference does
(`/root/reference/DF_serving/serving/serving.py:25,61-68` runs onnxruntime on
`root_dir/model_file`), with the inference math running on the TPU instead of
an external engine.  onnxruntime itself is absent in this image; the
env-gated cross-check test (tests/test_onnx.py) runs whenever it IS
installed.
"""

from __future__ import annotations

import numpy as np

from .proto import onnx_minimal_pb2 as pb

_DTYPES = {
    pb.TensorProto.FLOAT: np.float32,
    pb.TensorProto.INT64: np.int64,
    pb.TensorProto.INT32: np.int32,
    pb.TensorProto.DOUBLE: np.float64,
    pb.TensorProto.BOOL: np.bool_,
}


def _decode_tensor(tp: pb.TensorProto) -> np.ndarray:
    dtype = _DTYPES.get(tp.data_type)
    if dtype is None:
        raise ValueError(f"unsupported tensor data_type {tp.data_type}")
    shape = tuple(tp.dims)
    if tp.raw_data:
        arr = np.frombuffer(tp.raw_data, dtype=dtype)
    elif tp.float_data:
        arr = np.asarray(tp.float_data, np.float32).astype(dtype)
    elif tp.int64_data:
        arr = np.asarray(tp.int64_data, np.int64).astype(dtype)
    elif tp.int32_data:
        arr = np.asarray(tp.int32_data, np.int32).astype(dtype)
    elif tp.double_data:
        arr = np.asarray(tp.double_data, np.float64).astype(dtype)
    else:
        arr = np.zeros(shape, dtype)
    return arr.reshape(shape)


def _attrs(node: pb.NodeProto) -> dict:
    out = {}
    for a in node.attribute:
        if a.type == pb.AttributeProto.INT:
            out[a.name] = int(a.i)
        elif a.type == pb.AttributeProto.INTS:
            out[a.name] = tuple(a.ints)
        elif a.type == pb.AttributeProto.FLOAT:
            out[a.name] = float(a.f)
        elif a.type == pb.AttributeProto.STRING:
            out[a.name] = a.s.decode()
        elif a.type == pb.AttributeProto.TENSOR:
            out[a.name] = _decode_tensor(a.t)
    return out


class OnnxModel:
    """Executable ONNX graph.  ``model(x)`` returns the (first) output as a
    numpy array; the whole graph runs as one jitted XLA program per input
    shape."""

    def __init__(self, path: str):
        m = pb.ModelProto()
        with open(path, "rb") as f:
            m.ParseFromString(f.read())
        self.model = m
        g = m.graph
        self.initializers = {tp.name: _decode_tensor(tp) for tp in g.initializer}
        self.input_names = [
            vi.name for vi in g.input if vi.name not in self.initializers
        ]
        self.output_names = [vi.name for vi in g.output]
        self.nodes = list(g.node)
        self._validate()
        self._jitted = {}
        self._consts = None  # device-resident initializers, shared per shape

    # ------------------------------------------------------------ checking
    SUPPORTED = {
        "Conv", "MaxPool", "AveragePool", "GlobalAveragePool", "MatMul",
        "Gemm", "Add", "Sub", "Mul", "Div", "Pow", "Sqrt", "Relu", "Max",
        "Min", "Abs", "Exp", "Log", "Sigmoid", "Reshape", "Transpose",
        "TopK", "GreaterOrEqual", "Cast", "ReduceMean",
        "ReduceSum", "ReduceMax", "ReduceMin", "Erf", "Tanh",
        "Gather", "Slice",
        "Concat", "Flatten", "Softmax", "Identity", "Dropout",
        "BatchNormalization",
    }

    # attributes whose NON-DEFAULT values would change numerics silently
    _REJECT_ATTRS = {
        "Conv": {"dilations": lambda v: any(d != 1 for d in v),
                 "auto_pad": lambda v: v not in ("", "NOTSET")},
        "MaxPool": {"dilations": lambda v: any(d != 1 for d in v),
                    "ceil_mode": lambda v: v != 0,
                    "auto_pad": lambda v: v not in ("", "NOTSET")},
        "AveragePool": {"ceil_mode": lambda v: v != 0,
                        "auto_pad": lambda v: v not in ("", "NOTSET")},
    }

    def _validate(self):
        unsupported = {n.op_type for n in self.nodes} - self.SUPPORTED
        if unsupported:
            raise ValueError(f"unsupported ONNX ops: {sorted(unsupported)}")
        for n in self.nodes:
            checks = self._REJECT_ATTRS.get(n.op_type)
            if not checks:
                continue
            a = _attrs(n)
            for name, bad in checks.items():
                if name in a and bad(a[name]):
                    raise ValueError(
                        f"node {n.name or n.op_type}: unsupported attribute "
                        f"{name}={a[name]!r} (would silently change numerics)"
                    )
        known = set(self.initializers) | set(self.input_names)
        for n in self.nodes:
            for i in n.input:
                if i and i not in known:
                    raise ValueError(
                        f"node {n.name}: input {i!r} produced by no "
                        "node/initializer (graph is not topologically sorted?)"
                    )
            known.update(n.output)
        missing = [o for o in self.output_names if o not in known]
        if missing:
            raise ValueError(f"graph outputs never produced: {missing}")

    # ------------------------------------------------------------ execution
    def _run(self, consts, xs):
        import jax.numpy as jnp

        from ..backend import jax_kernels as K

        env = dict(consts)
        env.update(zip(self.input_names, xs))

        def pads4(attrs):
            p = attrs.get("pads", (0, 0, 0, 0))
            assert p[0] == p[2] and p[1] == p[3], f"asymmetric pads {p}"
            return (p[0], p[1])

        def shape_arg(idx):
            """Shape-like operand (Slice starts/ends, Reshape shape, axes)
            as RAW numpy int64.  Must bypass the jnp env: with x64 disabled,
            device_put truncates int64 to int32, so the ONNX open-slice
            sentinel INT64_MAX silently becomes -1 (= "stop at last-1")."""
            name = [i for i in n.input if i][idx]
            raw = self.initializers.get(name)
            return np.asarray(raw if raw is not None else env[name])

        for n in self.nodes:
            a = _attrs(n)
            ins = [env[i] for i in n.input if i]
            o = n.output[0]
            t = n.op_type
            if t == "Conv":
                env[o] = K.conv2d(
                    ins[0], ins[1],
                    stride=a.get("strides", (1, 1)),
                    padding=pads4(a),
                    groups=a.get("group", 1),
                )
                if len(ins) == 3:  # optional bias (C,)
                    env[o] = env[o] + ins[2].reshape(1, -1, 1, 1)
            elif t == "MaxPool":
                # ONNX defaults strides to 1 per spatial axis (NOT kernel)
                env[o] = K.max_pool2d(
                    ins[0], a["kernel_shape"],
                    a.get("strides", (1, 1)), pads4(a),
                )
            elif t == "AveragePool":
                env[o] = K.avg_pool2d(
                    ins[0], a["kernel_shape"],
                    a.get("strides", (1, 1)), pads4(a),
                )
            elif t == "GlobalAveragePool":
                env[o] = jnp.mean(ins[0], axis=(2, 3), keepdims=True)
            elif t == "MatMul":
                env[o] = ins[0] @ ins[1]
            elif t == "Gemm":
                x0 = ins[0].T if a.get("transA") else ins[0]
                w0 = ins[1].T if a.get("transB") else ins[1]
                y = a.get("alpha", 1.0) * (x0 @ w0)
                if len(ins) == 3:
                    y = y + a.get("beta", 1.0) * ins[2]
                env[o] = y
            elif t == "Add":
                env[o] = ins[0] + ins[1]
            elif t == "Sub":
                env[o] = ins[0] - ins[1]
            elif t == "Mul":
                env[o] = ins[0] * ins[1]
            elif t == "Div":
                env[o] = ins[0] / ins[1]
            elif t == "Pow":
                env[o] = ins[0] ** ins[1]
            elif t == "Sqrt":
                env[o] = jnp.sqrt(ins[0])
            elif t == "Relu":
                env[o] = jnp.maximum(ins[0], 0)
            elif t == "Max":
                env[o] = jnp.maximum(ins[0], ins[1])
            elif t == "Min":
                env[o] = jnp.minimum(ins[0], ins[1])
            elif t == "Abs":
                env[o] = jnp.abs(ins[0])
            elif t == "Exp":
                env[o] = jnp.exp(ins[0])
            elif t == "Log":
                env[o] = jnp.log(ins[0])
            elif t == "Sigmoid":
                import jax

                env[o] = jax.nn.sigmoid(ins[0])
            elif t == "TopK":
                import jax

                axis = a.get("axis", -1)
                k = int(shape_arg(1).ravel()[0])
                moved = axis not in (-1, ins[0].ndim - 1)
                x0 = jnp.moveaxis(ins[0], axis, -1) if moved else ins[0]
                vals, idx = jax.lax.top_k(x0, k)
                if moved:
                    vals = jnp.moveaxis(vals, -1, axis)
                    idx = jnp.moveaxis(idx, -1, axis)
                env[o] = vals
                if len(n.output) > 1 and n.output[1]:
                    env[n.output[1]] = idx.astype(jnp.int32)
            elif t == "GreaterOrEqual":
                env[o] = ins[0] >= ins[1]
            elif t == "Cast":
                to = {
                    1: jnp.float32, 6: jnp.int32, 7: jnp.int32,  # x64 off
                    9: jnp.bool_, 10: jnp.float16, 16: jnp.bfloat16,
                }.get(a.get("to"))
                if to is None:
                    raise ValueError(f"Cast to={a.get('to')} unsupported")
                env[o] = ins[0].astype(to)
            elif t == "Reshape":
                shape = [int(d) for d in shape_arg(1)]
                shape = [
                    ins[0].shape[i] if d == 0 else d for i, d in enumerate(shape)
                ]
                env[o] = ins[0].reshape(shape)
            elif t == "Transpose":
                env[o] = jnp.transpose(ins[0], a.get("perm"))
            elif t in ("ReduceMean", "ReduceSum", "ReduceMax", "ReduceMin"):
                fn = {
                    "ReduceMean": jnp.mean, "ReduceSum": jnp.sum,
                    "ReduceMax": jnp.max, "ReduceMin": jnp.min,
                }[t]
                axes = a.get("axes")
                if len(ins) > 1:  # opset-13 ReduceSum: axes as second input
                    axes = tuple(int(d) for d in shape_arg(1))
                env[o] = fn(
                    ins[0], axis=axes, keepdims=bool(a.get("keepdims", 1))
                )
            elif t == "Gather":
                env[o] = jnp.take(
                    ins[0], ins[1].astype(jnp.int32), axis=a.get("axis", 0)
                )
            elif t == "Slice":
                starts = [int(d) for d in shape_arg(1)]
                ends = [int(d) for d in shape_arg(2)]
                axes = (
                    [int(d) for d in shape_arg(3)]
                    if len([i for i in n.input if i]) > 3
                    else list(range(len(starts)))
                )
                sl = [slice(None)] * ins[0].ndim
                for st, en, ax in zip(starts, ends, axes):
                    dim = ins[0].shape[ax]
                    if st < 0:
                        st += dim
                    if en >= dim:  # incl. the INT64_MAX open-slice sentinel
                        en = None
                    elif en < 0:  # ONNX negative ends count from the end
                        en += dim
                    sl[ax] = slice(st, en)
                env[o] = ins[0][tuple(sl)]
            elif t == "Erf":
                from jax.scipy.special import erf as _jerf

                env[o] = _jerf(ins[0])
            elif t == "Tanh":
                env[o] = jnp.tanh(ins[0])
            elif t == "Concat":
                env[o] = jnp.concatenate(ins, axis=a["axis"])
            elif t == "Flatten":
                ax = a.get("axis", 1)
                env[o] = ins[0].reshape(
                    int(np.prod(ins[0].shape[:ax]) or 1), -1
                )
            elif t == "Softmax":
                env[o] = jnp.exp(
                    ins[0] - jnp.max(ins[0], axis=a.get("axis", -1), keepdims=True)
                )
                env[o] = env[o] / jnp.sum(
                    env[o], axis=a.get("axis", -1), keepdims=True
                )
            elif t in ("Identity", "Dropout"):
                env[o] = ins[0]
            elif t == "BatchNormalization":
                xv, scale, bias, mean, var = ins[:5]
                eps = a.get("epsilon", 1e-5)
                env[o] = (
                    (xv - mean.reshape(1, -1, 1, 1))
                    / jnp.sqrt(var.reshape(1, -1, 1, 1) + eps)
                ) * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)
            else:  # pragma: no cover - _validate guards this
                raise ValueError(t)
        return tuple(env[name] for name in self.output_names)

    def __call__(self, *xs):
        import jax

        if len(xs) != len(self.input_names):
            raise ValueError(
                f"graph takes {len(self.input_names)} inputs "
                f"{self.input_names}, got {len(xs)}"
            )
        xs = tuple(
            np.asarray(x)
            if np.issubdtype(np.asarray(x).dtype, np.integer)
            else np.asarray(x, np.float32)
            for x in xs
        )
        key = tuple(x.shape for x in xs)
        if key not in self._jitted:
            if self._consts is None:  # one device copy, shared by all shapes
                self._consts = {
                    k: jax.device_put(v) for k, v in self.initializers.items()
                }
            consts = self._consts
            run = jax.jit(lambda *a: self._run(consts, a))
            self._jitted[key] = run
        outs = self._jitted[key](*xs)
        out = [np.asarray(o) for o in outs]
        return out[0] if len(out) == 1 else out


def check_onnx(path: str) -> dict:
    """Structural checker: parses, validates op support + topology, returns a
    summary dict (node/initializer counts, op histogram, IO signature)."""
    m = OnnxModel(path)
    hist = {}
    for n in m.nodes:
        hist[n.op_type] = hist.get(n.op_type, 0) + 1
    return {
        "inputs": m.input_names,
        "outputs": m.output_names,
        "nodes": len(m.nodes),
        "initializers": len(m.initializers),
        "ops": hist,
        "opset": [o.version for o in m.model.opset_import],
    }
