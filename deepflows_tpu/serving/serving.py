"""gRPC serving (reference: `DF_serving/serving/serving.py`).

Same wire protocol (`MyDLPW.serving.MyDLPWServing/Predict` with
Matrix{value,dim} payloads, `DF_serving/serving/proto/serving.proto`), but
Predict runs THIS framework's jitted inference (`CompiledEvalStep`) instead
of the reference's ONNXRuntime detour (`serving.py:61-68`) — the model served
is a deepflows_tpu model on the TPU device.

The image has no grpc_python_plugin, so the service is registered with
grpc's generic method handlers over the protoc-generated message classes —
wire-identical to generated stubs.
"""

from __future__ import annotations

from concurrent import futures
from typing import Optional

import numpy as np

from .proto import serving_pb2

_SERVICE = "MyDLPW.serving.MyDLPWServing"


def _to_matrix(arr: np.ndarray) -> "serving_pb2.Matrix":
    m = serving_pb2.Matrix()
    m.value.extend(np.asarray(arr, dtype=np.float32).ravel().tolist())
    m.dim.extend(list(arr.shape))
    return m


def _from_matrix(m) -> np.ndarray:
    return np.asarray(m.value, dtype=np.float32).reshape(tuple(m.dim))


class PredictService:
    """Predict handler backed by a deepflows_tpu model or a loaded ONNX
    graph (both execute as jitted XLA programs)."""

    def __init__(
        self, model, decode_dtype=None, decode_quant=None,
        inflight_slots=None, inflight_chunk: int = 8, inflight_top_k=None,
        paged_blocks=None, block_size: int = 16,
        draft_model=None, spec_gamma: int = 4,
    ):
        """``decode_dtype``/``decode_quant`` configure the Generate RPC's
        KV-cache decoder (e.g. ``decode_dtype=jnp.bfloat16``); Predict is
        unaffected.  ``decode_quant="int8"`` is EXPERIMENTAL: measured on
        v5e it loses to plain bf16 decode at every scale tried, including
        B=1 on 0.8-1.6 B-param models where bf16 already streams weights at
        ~80% of HBM peak — the in-kernel int8->bf16 widening is VPU-bound
        (BENCH_NOTES "int8 regime hunt").  Use bf16 unless you have
        measured otherwise on your hardware.

        ``draft_model`` turns on SPECULATIVE DECODING for Generate
        (``models.SpeculativeDecoder``): the small draft proposes
        ``spec_gamma`` tokens per round, the served model verifies them in
        one chunk forward, and the emitted stream is exactly the served
        model's (greedy output bit-identical to the plain decoder).
        Requests using ``top_k``/``top_p`` fall back to the one-shot
        decoder (the acceptance ratio needs full distributions), as does
        everything when in-flight batching is also configured (the engine
        wins that routing).

        ``inflight_slots=N`` turns on IN-FLIGHT BATCHING for Generate:
        concurrent RPCs share one slot-based decode engine
        (``models.InflightEngine`` with N slots), so a request joins the
        running batch instead of waiting for a free device.  Requests whose
        ``top_k`` differs from the engine-global ``inflight_top_k`` fall
        back to the one-shot decoder, and with in-flight batching the
        sampling stream is engine-wide (the request's ``seed`` knob is not
        individually reproducible)."""
        from ..onnx import OnnxModel

        self._model = model
        self._decoder = None
        self._decode_dtype = decode_dtype
        self._decode_quant = decode_quant
        self._engine = None
        self._inflight_slots = inflight_slots
        self._inflight_chunk = inflight_chunk
        self._inflight_top_k = inflight_top_k
        self._paged_blocks = paged_blocks
        self._block_size = block_size
        self._draft_model = draft_model
        self._spec_gamma = spec_gamma
        self._spec = None
        self._prefixes: list = []
        if isinstance(model, OnnxModel):
            self._step = model
        else:
            from ..jit import CompiledEvalStep

            self._step = CompiledEvalStep(model)

    def register_prefix(self, tokens) -> None:
        """Prefill-and-cache a shared prompt prefix (system prompt) for the
        in-flight Generate path; requests whose prompt starts with it skip
        re-prefilling it (``InflightEngine.register_prefix``).  No-op
        routing consequence outside in-flight mode."""
        self._prefixes.append(np.asarray(tokens))
        if self._engine is not None:
            self._engine.register_prefix(self._prefixes[-1])

    def predict(self, request, context=None):
        outs = []
        for m in request.matrix:
            x = _from_matrix(m)
            y = np.asarray(self._step(x))
            outs.append(_to_matrix(y))
        resp = serving_pb2.PredictResp()
        resp.matrix.extend(outs)
        return resp

    def generate(self, request, context=None):
        """Autoregressive generation over the same Matrix wire types:
        matrix[0] = (B, L) prompt token ids, matrix[1] = [new_tokens],
        optional matrix[2] = [temperature, top_k, top_p, seed] sampling
        knobs (0 disables each; absent or temperature 0 = greedy).
        Returns matrix[0] = (B, L+new_tokens) tokens.  Served by the
        KV-cache decoder (`models.KVCacheDecoder`): one prefill + one
        fori_loop decode program, ONE host readback per call — not a full
        forward per token."""
        from ..models.decoding import KVCacheDecoder
        from ..models.llama import LlamaLM
        from ..models.mixtral import MixtralLM
        from ..models.seq2seq import Seq2SeqGenerator, Seq2SeqTransformer
        from ..models.transformer_lm import TransformerLM

        if isinstance(self._model, Seq2SeqTransformer):
            # encoder-decoder: matrix[0] = (B, Ls) SOURCE ids; the response
            # is the (B, new_tokens) generated TARGET (greedy; the seq2seq
            # generator has no sampling path).  matrix[2][3] is reused as
            # bos_id when present.
            if self._decoder is None:
                self._decoder = Seq2SeqGenerator(
                    self._model, compute_dtype=self._decode_dtype
                )
            src = _from_matrix(request.matrix[0]).astype(np.int32)
            new_tokens = int(_from_matrix(request.matrix[1]).ravel()[0])
            bos = 0
            if len(request.matrix) > 2:
                knobs = _from_matrix(request.matrix[2]).ravel()
                if len(knobs) > 3:
                    bos = int(knobs[3])
            tokens = self._decoder.generate(src, new_tokens, bos_id=bos)
            resp = serving_pb2.PredictResp()
            resp.matrix.extend([_to_matrix(tokens.astype(np.float32))])
            return resp
        if not isinstance(self._model, (TransformerLM, LlamaLM, MixtralLM)):
            raise ValueError(
                "Generate is only served for TransformerLM/LlamaLM/MixtralLM/"
                "Seq2SeqTransformer models; "
                f"got {type(self._model).__name__}"
            )
        if self._decoder is None:
            self._decoder = KVCacheDecoder(
                self._model,
                compute_dtype=self._decode_dtype,
                quant=self._decode_quant,
            )
        prompt = _from_matrix(request.matrix[0]).astype(np.int32)
        new_tokens = int(_from_matrix(request.matrix[1]).ravel()[0])
        sample_kw = {}
        if len(request.matrix) > 2:
            knobs = _from_matrix(request.matrix[2]).ravel()
            temperature, top_k, top_p, seed = (list(knobs) + [0.0] * 4)[:4]
            sample_kw = dict(
                temperature=float(temperature),
                top_k=int(top_k) if top_k > 0 else None,
                top_p=float(top_p) if top_p > 0 else None,
                seed=int(seed),
            )
        tokens = self._engine_generate(prompt, new_tokens, sample_kw)
        if tokens is None:
            tokens = self._speculative_generate(prompt, new_tokens, sample_kw)
        if tokens is None:
            tokens = self._decoder.generate(prompt, new_tokens, **sample_kw)
        resp = serving_pb2.PredictResp()
        resp.matrix.extend([_to_matrix(tokens.astype(np.float32))])
        return resp

    def _speculative_generate(self, prompt, new_tokens, sample_kw):
        """Serve a Generate call via draft-propose/target-verify when a
        draft model is configured and the request is compatible (no
        top-k/top-p truncation); None falls through to the plain
        decoder."""
        if self._draft_model is None or new_tokens < 1:
            return None
        if sample_kw.get("top_k") or sample_kw.get("top_p"):
            return None
        if self._spec is None:
            from ..models.speculative import SpeculativeDecoder

            self._spec = SpeculativeDecoder(
                self._model,
                self._draft_model,
                gamma=self._spec_gamma,
                compute_dtype=self._decode_dtype,
                quant=self._decode_quant,
            )
        return self._spec.generate(
            prompt,
            new_tokens,
            temperature=sample_kw.get("temperature", 0.0),
            seed=sample_kw.get("seed", 0),
        )

    def _engine_generate(self, prompt, new_tokens, sample_kw):
        """Route a Generate call through the shared in-flight engine when
        one is configured and the request is engine-compatible; returns
        None to fall back to the one-shot decoder.  Each prompt row
        becomes its own engine request, so concurrent RPCs (and rows)
        batch together on the device."""
        if self._inflight_slots is None or new_tokens < 1:
            return None
        temperature = sample_kw.get("temperature", 0.0)
        top_k = sample_kw.get("top_k")
        if temperature > 0.0 and top_k != self._inflight_top_k:
            return None  # engine top_k is static; mismatch -> one-shot path
        if self._engine is None:
            from ..models.engine import InflightEngine

            self._engine = InflightEngine(
                self._model,
                slots=self._inflight_slots,
                chunk=self._inflight_chunk,
                top_k=self._inflight_top_k,
                compute_dtype=self._decode_dtype,
                quant=self._decode_quant,
                paged_blocks=self._paged_blocks,
                block_size=self._block_size,
            )
            for pfx in self._prefixes:
                self._engine.register_prefix(pfx)
        handles = [
            self._engine.submit(
                row, new_tokens, temperature=temperature,
                top_p=sample_kw.get("top_p"),
            )
            for row in prompt
        ]
        # no eos on this RPC, so every row has the same length
        return np.stack([h.result(timeout=600) for h in handles])


class MyDLPWServicer:
    """gRPC server wrapper (reference `serving.py:71-92`): construct with a
    host:port and a model (or a checkpoint to restore into a model), then
    ``serve()``."""

    def __init__(
        self,
        host: str,
        model=None,
        root_dir: Optional[str] = None,
        model_file: Optional[str] = None,
        model_name: Optional[str] = None,
        num_classes: int = 1000,
        max_workers: int = 10,
        decode_dtype=None,
        decode_quant=None,
        inflight_slots=None,
        inflight_chunk: int = 8,
        inflight_top_k=None,
        paged_blocks=None,
        block_size: int = 16,
        draft_model=None,
        spec_gamma: int = 4,
    ):
        """Serve either an in-memory model, or a model FILE from disk
        (reference ctor contract `DF_serving/serving/serving.py:25,71-92`:
        ``root_dir`` + ``model_file``):

        - ``*.onnx`` → loaded with deepflows_tpu's own ONNX runtime and
          executed as a jitted XLA program (the reference ran onnxruntime
          here, `serving.py:61-68`); no model class needed.
        - ``*.pkl`` (deepflows checkpoint) → restored into the zoo model
          named ``model_name``."""
        import grpc

        if model is None and model_file is not None:
            import os

            path = os.path.join(root_dir or ".", model_file)
            if model_file.endswith(".onnx"):
                from ..onnx import OnnxModel

                model = OnnxModel(path)
            else:
                from ..utils.model_utils import load_checkpoint
                from ..utils.pretrained_models import _build_model

                if model_name is None:
                    raise ValueError(
                        "model_name required to serve from a checkpoint"
                    )
                model = _build_model(
                    model_name, num_classes=num_classes, device="tpu"
                )
                load_checkpoint(model, None, path, strict=False)
        if model is None:
            raise ValueError("pass a deepflows_tpu model (or a checkpoint) to serve")
        self.host = host
        self._service = PredictService(
            model,
            decode_dtype=decode_dtype,
            decode_quant=decode_quant,
            inflight_slots=inflight_slots,
            inflight_chunk=inflight_chunk,
            inflight_top_k=inflight_top_k,
            paged_blocks=paged_blocks,
            block_size=block_size,
            draft_model=draft_model,
            spec_gamma=spec_gamma,
        )
        self._server = grpc.server(futures.ThreadPoolExecutor(max_workers=max_workers))
        handler = grpc.method_handlers_generic_handler(
            _SERVICE,
            {
                "Predict": grpc.unary_unary_rpc_method_handler(
                    self._service.predict,
                    request_deserializer=serving_pb2.PredictReq.FromString,
                    response_serializer=serving_pb2.PredictResp.SerializeToString,
                ),
                # superset of the reference protocol: KV-cache decoding for
                # served LMs (same Matrix wire types)
                "Generate": grpc.unary_unary_rpc_method_handler(
                    self._service.generate,
                    request_deserializer=serving_pb2.PredictReq.FromString,
                    response_serializer=serving_pb2.PredictResp.SerializeToString,
                ),
            },
        )
        self._server.add_generic_rpc_handlers((handler,))
        self._server.add_insecure_port(host)

    def serve(self, wait: bool = True):
        self._server.start()
        if wait:
            self._server.wait_for_termination()
        return self._server

    def stop(self, grace: float = 0.5):
        self._server.stop(grace)
        if self._service._engine is not None:
            self._service._engine.close()
            self._service._engine = None


class PredictClient:
    """Client stub (reference `DF_serving/client.py`)."""

    def __init__(self, host: str):
        import grpc

        self._channel = grpc.insecure_channel(host)
        self._call = self._channel.unary_unary(
            f"/{_SERVICE}/Predict",
            request_serializer=serving_pb2.PredictReq.SerializeToString,
            response_deserializer=serving_pb2.PredictResp.FromString,
        )
        self._generate_call = self._channel.unary_unary(
            f"/{_SERVICE}/Generate",
            request_serializer=serving_pb2.PredictReq.SerializeToString,
            response_deserializer=serving_pb2.PredictResp.FromString,
        )

    def predict(self, *arrays: np.ndarray):
        req = serving_pb2.PredictReq()
        req.matrix.extend(_to_matrix(a) for a in arrays)
        resp = self._call(req)
        return [_from_matrix(m) for m in resp.matrix]

    def generate(
        self,
        prompt: np.ndarray,
        new_tokens: int,
        temperature: float = 0.0,
        top_k=None,
        top_p=None,
        seed: int = 0,
    ) -> np.ndarray:
        """Server-side KV-cache decoding: (B, L) int prompt ->
        (B, L+new_tokens) int tokens.  ``temperature=0`` (default) is
        greedy; otherwise temperature/top-k/top-p sampling with a
        reproducible ``seed`` (knobs ride an optional third Matrix)."""
        req = serving_pb2.PredictReq()
        mats = [
            _to_matrix(np.asarray(prompt, np.float32)),
            _to_matrix(np.asarray([new_tokens], np.float32)),
        ]
        if (temperature and temperature > 0.0) or seed:
            # seed alone also ships the knobs: greedy decoders ignore it,
            # and the seq2seq server path reads the slot as bos_id.
            # knobs ride a float32 Matrix: ints above 2^24 would be rounded
            # and the server would decode with a silently different value
            for name, val in (("seed", seed), ("top_k", top_k or 0)):
                if abs(int(val)) > 1 << 24:
                    raise ValueError(
                        f"{name}={val} exceeds the float32-exact integer "
                        f"range (2^24) of the Generate wire format"
                    )
            mats.append(
                _to_matrix(
                    np.asarray(
                        [temperature, top_k or 0, top_p or 0.0, seed],
                        np.float32,
                    )
                )
            )
        req.matrix.extend(mats)
        resp = self._generate_call(req)
        return _from_matrix(resp.matrix[0]).astype(np.int64)

    def close(self):
        self._channel.close()
