"""TTS serving runtime: HTTP server with micro-batching and a speaker cache.

Replaces the reference's Triton/TensorRT stack
(reference runtime/nvidia_triton/: model.py, pytriton_server.py) with a
TPU-native design:

- requests queue up and a worker thread forms micro-batches (dynamic
  batching, like Triton's), dispatching one compiled XLA program per
  (batch, token, frame) bucket — the "engine" is the jit cache, AOT-warmed
  at startup;
- a speaker cache stores precomputed prompt features + tokens per speaker
  id (reference pytriton_server.py:188-236), skipping fbank+G2P per request;
- plain HTTP/JSON (base64 wav in/out) via stdlib http.server so there is no
  framework dependency.

  python -m zipvoice_tpu.serving.server --model-dir DIR --port 8000

POST /tts        {"text": ..., "prompt_text": ..., "prompt_wav_b64": ...}
POST /tts        {"text": ..., "speaker": "cached_name"}
POST /speaker    {"name": ..., "prompt_text": ..., "prompt_wav_b64": ...}
GET  /health

OpenAI-compatible surface (the reference points to an external FastAPI
bridge for this, runtime/nvidia_triton/README.md:161-176; here it is
first-party):

POST /v1/audio/speech  {"model": ..., "input": text, "voice": speaker,
                        "response_format": "wav"|"pcm", "speed": 1.0}
                       -> raw audio bytes (voice = a cached speaker name)
GET  /v1/models
"""

import argparse
import base64
import io
import json
import logging
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import numpy as np


class SpeakerCache:
    def __init__(self, pipeline):
        self.pipeline = pipeline
        self._cache: Dict[str, dict] = {}
        self._lock = threading.Lock()

    def add(self, name: str, prompt_text: str, wav: np.ndarray, sr: int):
        from zipvoice_tpu.frontend.audio import remove_silence, rms_norm

        pipe = self.pipeline
        if sr != pipe.sampling_rate:
            from zipvoice_tpu.frontend.audio import resample

            wav = resample(wav, sr, pipe.sampling_rate)
        wav = remove_silence(wav, pipe.sampling_rate, trail_sil=200)
        wav, prompt_rms = rms_norm(wav, 0.1)
        feats = pipe.feature_extractor.extract(
            wav, pipe.sampling_rate
        ) * pipe.feat_scale
        tokens = pipe.tokenizer.texts_to_token_ids([prompt_text])[0]
        entry = {
            "features": feats,
            "tokens": tokens,
            "prompt_rms": prompt_rms,
            "duration": wav.shape[-1] / pipe.sampling_rate,
        }
        with self._lock:
            self._cache[name] = entry
        return entry

    def get(self, name: str) -> Optional[dict]:
        with self._lock:
            return self._cache.get(name)


class TTSEngine:
    """Micro-batching engine around the InferencePipeline.

    Two pipelined stages (the Triton decoupled-pipeline analog,
    reference runtime/nvidia_triton/README.md:146-157):

    - the SAMPLER thread forms micro-batches and dispatches the jitted
      sample program asynchronously (device arrays, no host sync), then
      immediately starts collecting the next batch;
    - the FINISHER thread syncs the device result, vocodes, trims, and
      replies.

    Batch N's vocode + host-side postprocess therefore overlaps batch
    N+1's sampling; the bounded hand-off queue (depth 2) applies
    backpressure so device work never races more than one batch ahead.
    A single serial worker loses ~20%% throughput at concurrency 8
    (PERF.md round-3 sweep: 36.9 audio-s/s vs 47.0 at c=4).
    """

    def __init__(self, pipeline, max_batch: int = 8,
                 batch_window_ms: float = 10.0, num_step: int = 16,
                 guidance_scale: float = 1.0):
        self.pipeline = pipeline
        self.cache = SpeakerCache(pipeline)
        self.max_batch = max_batch
        self.batch_window = batch_window_ms / 1000.0
        self.num_step = num_step
        self.guidance_scale = guidance_scale
        self.q: "queue.Queue" = queue.Queue()
        self._inflight: "queue.Queue" = queue.Queue(maxsize=2)
        self._sampler = threading.Thread(target=self._run_sampler,
                                         daemon=True)
        self._finisher = threading.Thread(target=self._run_finisher,
                                          daemon=True)
        self._sampler.start()
        self._finisher.start()

    def submit(self, speaker_entry: dict, text: str,
               speed: float = 1.0) -> "queue.Queue":
        done: "queue.Queue" = queue.Queue(maxsize=1)
        timing = {"submit": time.time()}
        tokens = self.pipeline.tokenizer.texts_to_token_ids([text])[0]
        timing["tokenized"] = time.time()
        self.q.put((speaker_entry, tokens, done, speed, timing))
        return done

    def _run_sampler(self):
        while True:
            first = self.q.get()
            batch = [first]
            deadline = time.time() + self.batch_window
            while len(batch) < self.max_batch:
                timeout = deadline - time.time()
                if timeout <= 0:
                    break
                try:
                    batch.append(self.q.get(timeout=timeout))
                except queue.Empty:
                    break
            # group by predicted frame bucket ONLY: the pipeline packs
            # per-row prompts/speeds into one micro-batch (reference
            # Triton backend pads per-request prompts into a shared
            # batch, runtime/nvidia_triton/model_repo/zipvoice/1/
            # model.py:94-167), so concurrent requests from DIFFERENT
            # speakers batch together.  Length-aware grouping stays:
            # mixed-length micro-batches pad every row to the longest
            # row's bucket (wasted compute) and mint new (B,S,T) shape
            # combinations (compile stalls); grouping by the duration
            # prediction's frame bucket removes both.
            try:
                from zipvoice_tpu.frontend.batch import bucket_length
                from zipvoice_tpu.infer.pipeline import FRAME_BUCKETS

                by_bucket: Dict[int, List] = {}
                for item in batch:
                    entry, tokens, _, speed, _ = item
                    pfl = entry["features"].shape[0]
                    ptl = max(len(entry["tokens"]), 1)
                    fl = pfl + int(np.ceil(
                        pfl / ptl * len(tokens) / max(speed, 1e-6)
                    ))
                    tb = bucket_length(
                        min(fl, FRAME_BUCKETS[-1]), FRAME_BUCKETS
                    )
                    by_bucket.setdefault(tb, []).append(item)
                groups = list(by_bucket.items())
            except Exception as e:  # noqa: BLE001
                # a grouping failure must not kill the sampler thread —
                # every queued request would hang with no reply
                logging.exception("batch grouping failed")
                for _, _, done, _, _ in batch:
                    done.put(("error", str(e), {}))
                continue
            for _, items in groups:
                tokens_list = [tokens for _, tokens, _, _, _ in items]
                prompt_tokens = [e["tokens"] for e, _, _, _, _ in items]
                prompt_feats = [e["features"] for e, _, _, _, _ in items]
                speeds = [s for _, _, _, s, _ in items]
                t_dispatch = time.time()
                for _, _, _, _, tm in items:
                    tm["dispatch"] = t_dispatch
                try:
                    dev = self.pipeline._sample_batch_device(
                        tokens_list, prompt_tokens, prompt_feats,
                        num_step=self.num_step,
                        guidance_scale=self.guidance_scale,
                        speed=speeds, t_shift=0.5,
                    )
                except Exception as e:  # noqa: BLE001
                    logging.exception("sample dispatch failed")
                    for _, _, done, _, _ in items:
                        done.put(("error", str(e), {}))
                    continue
                t_disp_done = time.time()
                for _, _, _, _, tm in items:
                    tm["dispatched"] = t_disp_done
                # blocks when 2 batches are already in flight
                self._inflight.put((items, dev))

    def _run_finisher(self):
        import numpy as _np

        pipe = self.pipeline
        while True:
            items, (x1_wo, wo_lens, B_real) = self._inflight.get()
            try:
                feats = _np.asarray(x1_wo)[:B_real] / pipe.feat_scale
                lens = _np.asarray(wo_lens)[:B_real]
                t_dev = time.time()  # device arrays materialized
                chunks = [feats[i, : lens[i]] for i in range(len(items))]
                wavs = pipe._vocode_chunks(chunks)
                t_voc = time.time()
                for (entry_, _, done, _, tm), wav in zip(items, wavs):
                    if entry_["prompt_rms"] < 0.1:
                        wav = wav * entry_["prompt_rms"] / 0.1
                    tm["device_done"] = t_dev
                    tm["vocoded"] = t_voc
                    done.put(("ok", wav, tm))
            except Exception as e:  # noqa: BLE001
                logging.exception("finish failed")
                for _, _, done, _, _ in items:
                    done.put(("error", str(e), {}))


def _wav_bytes(wav: np.ndarray, sr: int) -> bytes:
    import wave as wave_mod

    x = (np.clip(wav, -1, 1) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(x.tobytes())
    return buf.getvalue()


def _decode_wav_b64(b64: str):
    import wave as wave_mod

    raw = base64.b64decode(b64)
    with wave_mod.open(io.BytesIO(raw), "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        ch = f.getnchannels()
        data = np.frombuffer(f.readframes(n), np.int16)
    wav = (data.astype(np.float32) / 32768.0).reshape(-1, ch).T
    return wav, sr


def make_handler(engine: TTSEngine, model_name: str = "zipvoice"):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logging.debug(fmt % args)

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _bytes(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _openai_error(self, code: int, message: str,
                          err_type: str = "invalid_request_error"):
            self._json(code, {"error": {"message": message,
                                        "type": err_type}})

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"status": "ok"})
            elif self.path == "/v1/models":
                self._json(200, {
                    "object": "list",
                    "data": [{"id": model_name, "object": "model",
                              "owned_by": "zipvoice_tpu"}],
                })
            else:
                self._json(404, {"error": "not found"})

        def _openai_speech(self, req: dict):
            """OpenAI /v1/audio/speech: voice = a cached speaker name."""
            text = req.get("input")
            voice = req.get("voice")
            if not text or not voice:
                self._openai_error(400, "'input' and 'voice' are required")
                return
            entry = engine.cache.get(voice)
            if entry is None:
                self._openai_error(
                    404,
                    f"unknown voice {voice!r}; register it first via "
                    "POST /speaker",
                )
                return
            speed = float(req.get("speed", 1.0))
            fmt = req.get("response_format", "wav")
            if fmt not in ("wav", "pcm"):
                self._openai_error(
                    400, f"response_format {fmt!r} unsupported (wav|pcm)"
                )
                return
            status, result, _tm = engine.submit(entry, text, speed=speed).get()
            if status != "ok":
                self._openai_error(500, result, "server_error")
                return
            sr = engine.pipeline.sampling_rate
            if fmt == "pcm":
                pcm = (np.clip(result, -1, 1) * 32767).astype("<i2")
                self._bytes(200, pcm.tobytes(), "audio/pcm")
            else:
                self._bytes(200, _wav_bytes(result, sr), "audio/wav")

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(length))
            except json.JSONDecodeError:
                self._json(400, {"error": "bad json"})
                return
            if self.path == "/v1/audio/speech":
                self._openai_speech(req)
            elif self.path == "/speaker":
                wav, sr = _decode_wav_b64(req["prompt_wav_b64"])
                engine.cache.add(req["name"], req["prompt_text"], wav, sr)
                self._json(200, {"status": "ok"})
            elif self.path == "/tts":
                t0 = time.time()
                if "speaker" in req:
                    entry = engine.cache.get(req["speaker"])
                    if entry is None:
                        self._json(404, {"error": "unknown speaker"})
                        return
                else:
                    wav, sr = _decode_wav_b64(req["prompt_wav_b64"])
                    entry = engine.cache.add(
                        f"_anon_{time.time()}", req["prompt_text"], wav, sr
                    )
                done = engine.submit(entry, req["text"])
                status, result, tm = done.get()
                if status != "ok":
                    self._json(500, {"error": result})
                    return
                sr = engine.pipeline.sampling_rate
                sub = tm.get("submit", t0)
                phases = {
                    "tokenize_ms": (tm.get("tokenized", sub) - sub) * 1e3,
                    "queue_ms": (tm.get("dispatch", sub)
                                 - tm.get("tokenized", sub)) * 1e3,
                    "sample_ms": (tm.get("device_done", sub)
                                  - tm.get("dispatch", sub)) * 1e3,
                    "vocode_ms": (tm.get("vocoded", sub)
                                  - tm.get("device_done", sub)) * 1e3,
                } if tm else {}
                self._json(200, {
                    "wav_b64": base64.b64encode(
                        _wav_bytes(result, sr)
                    ).decode(),
                    "sample_rate": sr,
                    "latency_s": time.time() - t0,
                    "audio_s": len(result) / sr,
                    "timing": phases,
                })
            else:
                self._json(404, {"error": "not found"})

    return Handler


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-dir", type=str, required=True)
    p.add_argument("--model-name", type=str, default="zipvoice_distill")
    p.add_argument("--vocoder-path", type=str, default=None)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--num-step", type=int, default=4)
    p.add_argument("--guidance-scale", type=float, default=3.0)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--use-pallas-attention", action="store_true",
                   help="fused pallas attention kernel at the top U-Net "
                        "level (long first compile; persistently cached)")
    p.add_argument("--warmup", action="store_true",
                   help="precompile common (batch, token, frame) buckets "
                        "before accepting traffic (AOT engine warm)")
    p.add_argument("--warmup-buckets", type=str, default=None,
                   help="explicit comma list of B:S:T buckets to "
                        "precompile (with --warmup): the serving analog "
                        "of TensorRT optimization profiles — declare the "
                        "shapes your traffic hits and no request ever "
                        "pays a compile stall.  Read 'sample bucket' "
                        "lines from a traffic log to pick them")
    p.add_argument("--quantize", type=str, default=None,
                   choices=(None, "int8"),
                   help="weight-only int8 serving: params stored int8 in "
                        "HBM, dequantized inside the jitted programs "
                        "(reference's dynamic-int8 ONNX analog, "
                        "onnx_export.py:403-417). Disables --engine-dir "
                        "dispatch (engines are traced fp)")
    p.add_argument("--engine-dir", type=str, default=None,
                   help="serve from AOT-exported StableHLO engines "
                        "(bin/export_model.py): matching shape buckets skip "
                        "model tracing entirely; others fall back to jit. "
                        "Analog of the reference's prebuilt TensorRT "
                        "engines (runtime/nvidia_triton/run.sh stages 4-6)")
    p.add_argument("--platform", type=str, default=None, choices=[None, "cpu"])
    p.add_argument("--bf16", action="store_true", default=True)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax

    from zipvoice_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from zipvoice_tpu.infer.pipeline import InferencePipeline
    from zipvoice_tpu.utils.checkpoint_io import load_model_dir, load_vocos

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model, params, tokenizer = load_model_dir(
        args.model_dir, args.model_name, dtype=dtype,
        use_pallas_attention=args.use_pallas_attention,
    )
    vocoder, vp = load_vocos(args.vocoder_path, dtype=dtype)
    pipeline = InferencePipeline(model, params, vocoder, vp, tokenizer,
                                 quantize=args.quantize)
    if args.engine_dir:
        pipeline.attach_engines(args.engine_dir)
    engine = TTSEngine(
        pipeline, max_batch=args.max_batch, num_step=args.num_step,
        guidance_scale=args.guidance_scale,
    )
    if args.warmup_buckets and not args.warmup:
        # declaring exact traffic shapes is an explicit request to warm
        # them — don't silently ignore it when --warmup was omitted
        logging.info("--warmup-buckets given: enabling --warmup")
        args.warmup = True
    if args.warmup and args.engine_dir and pipeline._engines:
        # engines declare the serving buckets: warm exactly those (zero
        # jit compiles at startup); off-bucket requests jit on demand
        if args.warmup_buckets:
            logging.warning(
                "--engine-dir engines supersede --warmup-buckets: warming "
                "the exported engine buckets instead (re-export with "
                "bin/export_model --buckets to change them)"
            )
        logging.info("warming attached AOT engine buckets...")
        n = pipeline.warm_engines()
        logging.info(f"warmup done ({n} engines)")
    elif args.warmup and args.warmup_buckets:
        logging.info("warming declared buckets...")
        for spec in args.warmup_buckets.split(","):
            B, S, T = (int(x) for x in spec.strip().split(":"))
            pipeline.warm_bucket(
                B, S, T, num_step=args.num_step,
                guidance_scale=args.guidance_scale,
            )
        logging.info("warmup done")
    elif args.warmup:
        from zipvoice_tpu.frontend.batch import bucket_length
        from zipvoice_tpu.infer.pipeline import BATCH_BUCKETS

        logging.info("warming compile cache over common buckets...")
        # every batch bucket up to max_batch: micro-batching forms
        # intermediate sizes (2, 4, ...) the moment two requests land in
        # one window, and an unwarmed size stalls them for a full compile.
        # (S, T) pairs cover short (~5 s) and long (~10 s) requests with a
        # 2-4 s prompt; declare exact traffic shapes via --warmup-buckets.
        # max_batch is rounded UP to its bucket: _sample_batch dispatches
        # bucketed shapes, so e.g. --max-batch 6 traffic runs at B=8 and
        # warming a B=6 program would leave the real bucket cold.
        batches = sorted({
            b for b in BATCH_BUCKETS if b <= args.max_batch
        } | {bucket_length(args.max_batch, BATCH_BUCKETS)})
        for nb in batches:
            for (ntok, nframe) in ((64, 512), (64, 768), (128, 1024)):
                pipeline.warm_bucket(
                    nb, ntok, nframe, num_step=args.num_step,
                    guidance_scale=args.guidance_scale,
                )
        logging.info("warmup done")
    server = ThreadingHTTPServer(
        ("0.0.0.0", args.port), make_handler(engine, args.model_name)
    )
    logging.info(f"serving on :{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
