"""Serving runtime: speaker cache + micro-batching engine + HTTP endpoints."""

import base64
import io
import json
import string
import threading
import urllib.error
import urllib.request
import wave as wave_mod

import numpy as np
import pytest

import conftest  # noqa: F401

torch = pytest.importorskip("torch")


def _wav_b64(wav: np.ndarray, sr: int) -> str:
    x = (np.clip(wav, -1, 1) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(x.tobytes())
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    from conftest import has_reference

    if not has_reference():
        pytest.skip("reference unavailable")
    import json as _json

    from zipvoice.models.zipvoice import ZipVoice as RefZipVoice

    tmp_path = tmp_path_factory.mktemp("model")
    from test_infer_pipeline import TINY

    chars = ["_"] + list(string.ascii_lowercase) + list(" .,!?'")
    (tmp_path / "tokens.txt").write_text(
        "".join(f"{c}\t{i}\n" for i, c in enumerate(chars))
    )
    torch.manual_seed(0)
    ref = RefZipVoice(**TINY, vocab_size=len(chars), pad_id=0)
    torch.save({"model": ref.state_dict()}, tmp_path / "model.pt")
    (tmp_path / "model.json").write_text(_json.dumps({"model": TINY}))
    return tmp_path


def test_server_end_to_end(tiny_model_dir):
    from zipvoice_tpu.infer.pipeline import InferencePipeline
    from zipvoice_tpu.serving.server import TTSEngine, make_handler
    from zipvoice_tpu.utils.checkpoint_io import load_model_dir, load_vocos
    from http.server import ThreadingHTTPServer

    model, params, tokenizer = load_model_dir(str(tiny_model_dir), "zipvoice")
    vocoder, vp = load_vocos(None)
    pipeline = InferencePipeline(model, params, vocoder, vp, tokenizer)
    engine = TTSEngine(pipeline, max_batch=4, num_step=2, guidance_scale=1.0)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post(path, obj):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(obj).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.loads(r.read())

    # health
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/health", timeout=10
    ) as r:
        assert json.loads(r.read())["status"] == "ok"

    # register a speaker (1.2 s tone prompt)
    sr = 24000
    t = np.arange(int(1.2 * sr), dtype=np.float32) / sr
    prompt = 0.2 * np.sin(2 * np.pi * 220 * t)
    assert post("/speaker", {
        "name": "spk1",
        "prompt_text": "hello there.",
        "prompt_wav_b64": _wav_b64(prompt, sr),
    })["status"] == "ok"

    # cached-speaker tts
    out = post("/tts", {"speaker": "spk1", "text": "a test sentence."})
    assert out["sample_rate"] == sr
    assert out["audio_s"] > 0
    # phase decomposition rides in every reply (round 5: variance
    # attribution); all phases non-negative, sample is the largest
    tm = out["timing"]
    assert set(tm) == {"tokenize_ms", "queue_ms", "sample_ms",
                       "vocode_ms"}
    assert all(v >= 0 for v in tm.values()), tm
    wav_bytes = base64.b64decode(out["wav_b64"])
    with wave_mod.open(io.BytesIO(wav_bytes), "rb") as f:
        assert f.getframerate() == sr
        assert f.getnframes() > 0

    # inline-prompt tts + unknown speaker error
    out2 = post("/tts", {
        "text": "another one.",
        "prompt_text": "hello there.",
        "prompt_wav_b64": _wav_b64(prompt, sr),
    })
    assert out2["audio_s"] > 0
    try:
        post("/tts", {"speaker": "nope", "text": "x"})
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404

    # OpenAI-compatible surface
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/v1/models", timeout=10
    ) as r:
        models = json.loads(r.read())
        assert models["data"][0]["id"] == "zipvoice"

    def post_raw(path, obj):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(obj).encode(),
            headers={"Content-Type": "application/json"},
        )
        return urllib.request.urlopen(req, timeout=300)

    with post_raw("/v1/audio/speech", {
        "model": "zipvoice", "input": "openai style call.",
        "voice": "spk1", "response_format": "wav",
    }) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        with wave_mod.open(io.BytesIO(r.read()), "rb") as f:
            assert f.getframerate() == sr and f.getnframes() > 0

    with post_raw("/v1/audio/speech", {
        "model": "zipvoice", "input": "pcm please.", "voice": "spk1",
        "response_format": "pcm", "speed": 1.25,
    }) as r:
        assert r.headers["Content-Type"] == "audio/pcm"
        pcm = np.frombuffer(r.read(), "<i2")
        assert pcm.size > 0

    # OpenAI-style errors: unknown voice -> 404 with error envelope
    try:
        post_raw("/v1/audio/speech", {"input": "x", "voice": "nope"})
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404
        assert "unknown voice" in json.loads(e.read())["error"]["message"]
    server.shutdown()


def test_warm_bucket(tiny_model_dir):
    """warm_bucket precompiles the exact (B, S, T) sample program plus the
    batched vocoder glue, and a following real request at that bucket
    reuses the cached programs (no new compile entries)."""
    from zipvoice_tpu.infer.pipeline import InferencePipeline
    from zipvoice_tpu.utils.checkpoint_io import load_model_dir, load_vocos

    model, params, tokenizer = load_model_dir(str(tiny_model_dir), "zipvoice")
    vocoder, vp = load_vocos(None)
    pipe = InferencePipeline(model, params, vocoder, vp, tokenizer)
    pipe.warm_bucket(2, 32, 128, num_step=2, guidance_scale=1.0)
    n_sample = len(pipe._sample_cache)
    n_vocode = len(pipe._vocode_cache)
    assert n_sample == 1
    # a real 2-utterance batch landing in the warmed bucket: same programs
    toks = tokenizer.texts_to_token_ids(["hi there.", "more text."])
    feats, lens = pipe._sample_batch(
        toks, tokenizer.texts_to_token_ids(["a prompt."])[0],
        np.random.RandomState(0).randn(24, model.feat_dim).astype("f") * 0.1,
        num_step=2, guidance_scale=1.0, speed=1.0, t_shift=0.5,
    )
    pipe._vocode_chunks([feats[i, : lens[i]] for i in range(2)])
    assert len(pipe._sample_cache) == n_sample
    assert len(pipe._vocode_cache) == n_vocode
    assert np.isfinite(feats).all()


def test_warm_bucket_snaps_off_ladder_specs(tiny_model_dir):
    """An off-ladder --warmup-buckets spec (e.g. 3:40:100) must warm the
    bucketed shape _sample_batch will actually dispatch, not a dead one."""
    from zipvoice_tpu.infer.pipeline import InferencePipeline
    from zipvoice_tpu.utils.checkpoint_io import load_model_dir, load_vocos

    model, params, tokenizer = load_model_dir(str(tiny_model_dir), "zipvoice")
    vocoder, vp = load_vocos(None)
    pipe = InferencePipeline(model, params, vocoder, vp, tokenizer)
    pipe.warm_bucket(3, 40, 100, num_step=2, guidance_scale=1.0)
    # snapped up to (4, 64, 128); a real 3-utterance batch reuses it
    assert (4, 64, 128) in pipe._seen_buckets
    toks = tokenizer.texts_to_token_ids(["one.", "two.", "three."])
    feats, lens = pipe._sample_batch(
        toks, tokenizer.texts_to_token_ids(["a prompt."])[0],
        np.random.RandomState(0).randn(24, model.feat_dim).astype("f") * 0.1,
        num_step=2, guidance_scale=1.0, speed=1.0, t_shift=0.5,
    )
    assert len(pipe._sample_cache) == 1
    assert np.isfinite(feats).all()


def test_server_warmup_batches_round_to_buckets():
    """--max-batch 6 must warm B=8 (the bucket real traffic dispatches),
    never a dead B=6 program (ADVICE r3)."""
    from zipvoice_tpu.frontend.batch import bucket_length
    from zipvoice_tpu.infer.pipeline import BATCH_BUCKETS

    max_batch = 6
    batches = sorted({
        b for b in BATCH_BUCKETS if b <= max_batch
    } | {bucket_length(max_batch, BATCH_BUCKETS)})
    assert batches == [1, 2, 4, 8]
    max_batch = 8
    batches = sorted({
        b for b in BATCH_BUCKETS if b <= max_batch
    } | {bucket_length(max_batch, BATCH_BUCKETS)})
    assert batches == [1, 2, 4, 8]


def test_heterogeneous_prompt_batch(tiny_model_dir):
    """Per-row prompts: a mixed-speaker micro-batch must produce, row for
    row, the same features as homogeneous batches of each speaker (the
    reference Triton backend pads per-request prompts into one batch,
    runtime/nvidia_triton/model_repo/zipvoice/1/model.py:94-167; rows are
    independent programs, so batching across speakers is lossless)."""
    from zipvoice_tpu.infer.pipeline import InferencePipeline
    from zipvoice_tpu.utils.checkpoint_io import load_model_dir, load_vocos

    model, params, tokenizer = load_model_dir(str(tiny_model_dir), "zipvoice")
    vocoder, vp = load_vocos(None)
    pipe = InferencePipeline(model, params, vocoder, vp, tokenizer)

    rs = np.random.RandomState(7)
    tok_a = tokenizer.texts_to_token_ids(["speaker a prompt."])[0]
    tok_b = tokenizer.texts_to_token_ids(["b prompt, longer text!"])[0]
    feat_a = (rs.randn(24, model.feat_dim) * 0.1).astype(np.float32)
    feat_b = (rs.randn(32, model.feat_dim) * 0.1).astype(np.float32)
    text_a = tokenizer.texts_to_token_ids(["first sentence."])[0]
    text_b = tokenizer.texts_to_token_ids(["second one."])[0]

    def run(batch_tokens, prompt_tokens, prompt_feats, speed=1.0):
        pipe.rng = np.random.RandomState(0)  # identical noise per call
        return pipe._sample_batch(
            batch_tokens, prompt_tokens, prompt_feats,
            num_step=2, guidance_scale=1.0, speed=speed, t_shift=0.5,
        )

    hetero_f, hetero_l = run(
        [text_a, text_b], [tok_a, tok_b], [feat_a, feat_b],
        speed=[1.0, 1.0],
    )
    homo_a_f, homo_a_l = run([text_a, text_a], tok_a, feat_a)
    homo_b_f, homo_b_l = run([text_b, text_b], tok_b, feat_b)
    # same (B, S, T) bucket for all three calls -> identical noise draws,
    # and rows are independent, so the mixed batch matches row-for-row
    assert hetero_f.shape == homo_a_f.shape == homo_b_f.shape
    assert hetero_l[0] == homo_a_l[0]
    assert hetero_l[1] == homo_b_l[1]
    np.testing.assert_allclose(
        hetero_f[0, : hetero_l[0]], homo_a_f[0, : homo_a_l[0]],
        rtol=0, atol=1e-5,
    )
    np.testing.assert_allclose(
        hetero_f[1, : hetero_l[1]], homo_b_f[1, : homo_b_l[1]],
        rtol=0, atol=1e-5,
    )
    # per-row speed changes only that row's predicted length
    fast_f, fast_l = run(
        [text_a, text_b], [tok_a, tok_b], [feat_a, feat_b],
        speed=[1.0, 2.0],
    )
    assert fast_l[0] == hetero_l[0]
    assert fast_l[1] < hetero_l[1]


def test_server_batches_across_speakers(tiny_model_dir):
    """The engine must put concurrent requests from DIFFERENT speakers in
    ONE micro-batch (round-4 served them as per-speaker singletons)."""
    from zipvoice_tpu.infer.pipeline import InferencePipeline
    from zipvoice_tpu.serving.server import TTSEngine
    from zipvoice_tpu.utils.checkpoint_io import load_model_dir, load_vocos

    model, params, tokenizer = load_model_dir(str(tiny_model_dir), "zipvoice")
    vocoder, vp = load_vocos(None)
    pipeline = InferencePipeline(model, params, vocoder, vp, tokenizer)

    calls = []
    orig = pipeline._sample_batch_device

    def spy(batch_tokens, prompt_tokens, prompt_feats, **kw):
        calls.append((len(batch_tokens), prompt_tokens))
        return orig(batch_tokens, prompt_tokens, prompt_feats, **kw)

    pipeline._sample_batch_device = spy
    engine = TTSEngine(pipeline, max_batch=4, batch_window_ms=2000.0,
                       num_step=2, guidance_scale=1.0)
    rs = np.random.RandomState(3)
    entry_a = {
        "tokens": tokenizer.texts_to_token_ids(["voice a."])[0],
        "features": (rs.randn(24, model.feat_dim) * 0.1).astype(np.float32),
        "prompt_rms": 0.15,
    }
    entry_b = {
        "tokens": tokenizer.texts_to_token_ids(["voice b here."])[0],
        "features": (rs.randn(32, model.feat_dim) * 0.1).astype(np.float32),
        "prompt_rms": 0.15,
    }
    d1 = engine.submit(entry_a, "short text one.")
    d2 = engine.submit(entry_b, "short text two.")
    s1, wav1, _tm1 = d1.get(timeout=600)
    s2, wav2, _tm2 = d2.get(timeout=600)
    assert s1 == "ok" and s2 == "ok"
    assert len(wav1) > 0 and len(wav2) > 0
    # both speakers landed in one dispatch with per-row prompts
    assert len(calls) == 1, calls
    n_rows, ptoks = calls[0]
    assert n_rows == 2
    assert isinstance(ptoks, list) and isinstance(ptoks[0], list)
    assert ptoks[0] != ptoks[1]
