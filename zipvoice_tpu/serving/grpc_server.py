"""gRPC TTS service: unary synthesis (micro-batched) + server streaming.

Counterpart of the reference's Triton gRPC serving surface
(reference runtime/nvidia_triton/: model_repo TTS service + client_grpc.py
bench harness, including the decoupled/streaming mode).  Methods use JSON
requests and raw bytes responses over grpc's generic handler API — no
protoc code-gen step, the wire contract is the method table below.

Service ``/zipvoice.TTS/``:
  RegisterSpeaker   unary   {"name", "prompt_text", "wav_b64", "sr"} -> {"ok"}
  Synthesize        unary   {"speaker", "text", ["speed"]} -> WAV bytes
                            (routed through the micro-batching TTSEngine)
  SynthesizeStream  stream  {"speaker", "text", ["speed"]} -> int16 PCM
                            chunks as text chunks are synthesized (B=1,
                            lowest TTFB); first response metadata carries
                            sample_rate

Run:  python -m zipvoice_tpu.serving.grpc_server --model-dir DIR --port 50051
Bench: python -m zipvoice_tpu.serving.client_grpc ...
"""

import argparse
import json
import logging
from concurrent import futures

import numpy as np

SERVICE = "zipvoice.TTS"


def _ident(b):
    return b


class _TTSHandler:
    """Generic gRPC handler backed by TTSEngine (unary) + pipeline
    streaming."""

    def __init__(self, engine, num_step: int, guidance_scale: float):
        self.engine = engine
        self.num_step = num_step
        self.guidance_scale = guidance_scale

    # --- methods -----------------------------------------------------------

    def register(self, request: bytes, context) -> bytes:
        req = json.loads(request.decode())
        import base64
        import io
        import wave

        raw = base64.b64decode(req["wav_b64"])
        with wave.open(io.BytesIO(raw)) as f:
            sr = f.getframerate()
            n = f.getnframes()
            wav = np.frombuffer(
                f.readframes(n), np.int16
            ).astype(np.float32)[None] / 32768.0
        self.engine.cache.add(req["name"], req["prompt_text"], wav, sr)
        return json.dumps({"ok": True}).encode()

    def synthesize(self, request: bytes, context) -> bytes:
        from zipvoice_tpu.serving.server import _wav_bytes

        req = json.loads(request.decode())
        entry = self.engine.cache.get(req["speaker"])
        if entry is None:
            context.abort(3, f"unknown speaker {req['speaker']!r}")
        done = self.engine.submit(entry, req["text"],
                                  speed=float(req.get("speed", 1.0)))
        status, payload, _tm = done.get()
        if status != "ok":
            context.abort(13, payload)
        return _wav_bytes(payload[None], self.engine.pipeline.sampling_rate)

    def synthesize_stream(self, request: bytes, context):
        req = json.loads(request.decode())
        pipe = self.engine.pipeline
        entry = self.engine.cache.get(req["speaker"])
        if entry is None:
            context.abort(3, f"unknown speaker {req['speaker']!r}")
        context.send_initial_metadata(
            (("sample-rate", str(pipe.sampling_rate)),)
        )
        for seg in pipe.generate_stream(
            entry["tokens"], entry["features"], req["text"],
            num_step=self.num_step, guidance_scale=self.guidance_scale,
            speed=float(req.get("speed", 1.0)),
            prompt_rms=entry["prompt_rms"],
        ):
            pcm = np.clip(seg[0], -1.0, 1.0)
            yield (pcm * 32767.0).astype("<i2").tobytes()


class _Generic(object):
    pass


def make_server(engine, port: int, num_step: int, guidance_scale: float,
                max_workers: int = 16):
    import grpc

    h = _TTSHandler(engine, num_step, guidance_scale)
    handlers = {
        "RegisterSpeaker": grpc.unary_unary_rpc_method_handler(
            h.register, request_deserializer=_ident,
            response_serializer=_ident,
        ),
        "Synthesize": grpc.unary_unary_rpc_method_handler(
            h.synthesize, request_deserializer=_ident,
            response_serializer=_ident,
        ),
        "SynthesizeStream": grpc.unary_stream_rpc_method_handler(
            h.synthesize_stream, request_deserializer=_ident,
            response_serializer=_ident,
        ),
    }
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=max_workers))
    server.add_generic_rpc_handlers(
        (grpc.method_handlers_generic_handler(SERVICE, handlers),)
    )
    bound = server.add_insecure_port(f"[::]:{port}")
    return server, bound


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-dir", type=str, required=True)
    p.add_argument("--model-name", type=str, default="zipvoice_distill")
    p.add_argument("--vocoder-path", type=str, default=None)
    p.add_argument("--port", type=int, default=50051)
    p.add_argument("--num-step", type=int, default=4)
    p.add_argument("--guidance-scale", type=float, default=3.0)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--use-pallas-attention", action="store_true")
    p.add_argument("--engine-dir", type=str, default=None)
    p.add_argument("--quantize", type=str, default=None,
                   choices=(None, "int8"))
    p.add_argument("--platform", type=str, default=None, choices=[None, "cpu"])
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax

    from zipvoice_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from zipvoice_tpu.infer.pipeline import InferencePipeline
    from zipvoice_tpu.serving.server import TTSEngine
    from zipvoice_tpu.utils.checkpoint_io import load_model_dir, load_vocos

    model, params, tokenizer = load_model_dir(
        args.model_dir, args.model_name, dtype=jnp.bfloat16,
        use_pallas_attention=args.use_pallas_attention,
    )
    vocoder, vp = load_vocos(args.vocoder_path, dtype=jnp.bfloat16)
    pipeline = InferencePipeline(model, params, vocoder, vp, tokenizer,
                                 quantize=args.quantize)
    if args.engine_dir:
        pipeline.attach_engines(args.engine_dir)
    engine = TTSEngine(pipeline, max_batch=args.max_batch,
                       num_step=args.num_step,
                       guidance_scale=args.guidance_scale)
    server, bound = make_server(engine, args.port, args.num_step,
                                args.guidance_scale)
    server.start()
    logging.info(f"gRPC serving on :{bound}")
    server.wait_for_termination()


if __name__ == "__main__":
    main()
