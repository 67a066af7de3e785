"""End-to-end inference pipeline smoke test: reference-layout model dir with
a tiny converted torch checkpoint -> wav out (CPU, char-fallback G2P)."""

import json
import string

import numpy as np
import pytest

from conftest import requires_reference

torch = pytest.importorskip("torch")

TINY = dict(
    fm_decoder_downsampling_factor=[1, 2, 1],
    fm_decoder_num_layers=[1, 1, 1],
    fm_decoder_cnn_module_kernel=[7, 7, 7],
    fm_decoder_feedforward_dim=96,
    fm_decoder_num_heads=4,
    fm_decoder_dim=64,
    text_encoder_num_layers=1,
    text_encoder_feedforward_dim=64,
    text_encoder_cnn_module_kernel=5,
    text_encoder_num_heads=4,
    text_encoder_dim=32,
    time_embed_dim=32,
    text_embed_dim=32,
    query_head_dim=8,
    value_head_dim=12,
    pos_head_dim=4,
    pos_dim=48,
    feat_dim=100,
)


@requires_reference
def test_pipeline_end_to_end(tmp_path):
    from zipvoice.models.zipvoice import ZipVoice as RefZipVoice

    # --- build a reference-layout model dir --------------------------------
    chars = (
        ["_"] + list(string.ascii_lowercase) + list(" .,!?'")
        + list(string.ascii_uppercase)
    )
    token_file = tmp_path / "tokens.txt"
    token_file.write_text(
        "".join(f"{c}\t{i}\n" for i, c in enumerate(chars))
    )
    torch.manual_seed(0)
    ref = RefZipVoice(**TINY, vocab_size=len(chars), pad_id=0)
    torch.save({"model": ref.state_dict()}, tmp_path / "model.pt")
    (tmp_path / "model.json").write_text(json.dumps({"model": TINY}))

    # --- prompt wav ---------------------------------------------------------
    from zipvoice_tpu.frontend.audio import save_wav

    sr = 24000
    t = np.arange(int(1.2 * sr), dtype=np.float32) / sr
    prompt = (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None]
    wav_path = str(tmp_path / "prompt.wav")
    save_wav(wav_path, prompt, sr)

    # --- run the pipeline ---------------------------------------------------
    from zipvoice_tpu.infer.pipeline import InferencePipeline
    from zipvoice_tpu.utils.checkpoint_io import load_model_dir, load_vocos

    model, params, tokenizer = load_model_dir(str(tmp_path), "zipvoice")
    vocoder, vp = load_vocos(None)
    pipe = InferencePipeline(model, params, vocoder, vp, tokenizer)

    wav, metrics = pipe.generate_sentence(
        prompt_text="hello there.",
        prompt_wav_path=wav_path,
        text="this is a test sentence.",
        num_step=2,
        guidance_scale=1.0,
    )
    assert wav.ndim == 2 and wav.shape[0] == 1
    assert np.isfinite(wav).all()
    assert metrics["wav_seconds"] > 0
    assert metrics["rtf"] > 0


@requires_reference
def test_infer_cli(tmp_path):
    """Drive the CLI end to end as a subprocess (the user surface)."""
    import os
    import subprocess
    import sys

    from zipvoice.models.zipvoice import ZipVoice as RefZipVoice

    chars = ["_"] + list(string.ascii_lowercase) + list(" .,!?'")
    (tmp_path / "tokens.txt").write_text(
        "".join(f"{c}\t{i}\n" for i, c in enumerate(chars))
    )
    torch.manual_seed(0)
    ref = RefZipVoice(**TINY, vocab_size=len(chars), pad_id=0)
    torch.save({"model": ref.state_dict()}, tmp_path / "model.pt")
    (tmp_path / "model.json").write_text(json.dumps({"model": TINY}))

    from zipvoice_tpu.frontend.audio import load_wav, save_wav

    sr = 24000
    t = np.arange(int(1.2 * sr), dtype=np.float32) / sr
    prompt = (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None]
    wav_path = str(tmp_path / "prompt.wav")
    save_wav(wav_path, prompt, sr)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out_path = str(tmp_path / "out.wav")
    r = subprocess.run(
        [sys.executable, "-m", "zipvoice_tpu.bin.infer_zipvoice",
         "--model-dir", str(tmp_path), "--prompt-wav", wav_path,
         "--prompt-text", "hello there.", "--text", "short test.",
         "--num-step", "2", "--res-wav-path", out_path,
         "--platform", "cpu"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=500,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "rtf" in (r.stdout + r.stderr)
    wav = load_wav(out_path, sr)
    assert wav.shape[-1] > 0 and np.isfinite(wav).all()


def test_generate_stream_matches_offline_crossfade():
    """Concatenating generate_stream's segments equals cross_fade_concat
    over the per-chunk wavs (the offline merge)."""
    from zipvoice_tpu.frontend.audio import cross_fade_concat
    from zipvoice_tpu.infer.pipeline import InferencePipeline

    class Tok:
        pad_id = 0

        def texts_to_tokens(self, texts):
            return [list(t) for t in texts]

        def tokens_to_token_ids(self, tl):
            return [[ord(c[0]) % 20 + 1 for c in t] for t in tl]

    pipe = InferencePipeline.__new__(InferencePipeline)
    pipe.sampling_rate = 24000
    pipe.tokenizer = Tok()

    rng = np.random.RandomState(0)
    wavs = {}

    def fake_sample(batch_tokens, *a, **k):
        key = tuple(batch_tokens[0])
        if key not in wavs:
            n = 24000 + 100 * len(wavs)
            wavs[key] = rng.randn(n).astype(np.float32) * 0.1
        feats = np.zeros((1, 4, 2), np.float32)
        feats[0, 0, 0] = float(len(wavs))
        return feats, np.array([4])

    order = []

    def fake_vocode(chunks):
        # invoked once per stream chunk with the fake feats; map back by
        # arrival order
        order.append(len(order))
        return [list(wavs.values())[order[-1]]]

    pipe._sample_batch = fake_sample
    pipe._vocode_chunks = fake_vocode

    text = "first sentence, with clauses. second one here. third bit!"
    prompt_tokens = [1, 2, 3, 4, 5]
    # long prompt -> small max_tokens -> the text splits into many chunks
    prompt_features = np.zeros((2000, 2), np.float32)
    segs = list(pipe.generate_stream(prompt_tokens, prompt_features, text,
                                     num_step=1))
    assert len(wavs) >= 2, "text did not chunk"
    streamed = np.concatenate(segs, axis=-1)
    offline = cross_fade_concat([w[None] for w in wavs.values()],
                                fade_duration=0.1, sample_rate=24000)
    np.testing.assert_allclose(streamed, offline, atol=1e-6)


def test_frame_bucket_hygiene():
    """Every inference/dataset frame bucket is sublane-aligned (T % 8 == 0,
    the pallas kernel's _row_tile requirement) and the kernel-eligible
    levels (T >= MIN_SEQ_LEN) take the efficient 128-row tile; the compile
    surface (distinct Mosaic kernel shapes) stays bounded.

    The bound is on the TRUE compile surface — the union of per-level
    sequence lengths the U-Net actually runs kernels at, derived from the
    fm_decoder's downsampling factors (1, 2, 4, 2, 1 -> levels T, T/2,
    T/4; models/zipvoice.py:34) — not a bucket-count proxy: pruning the
    768 bucket would NOT remove the 768-frame Mosaic shape (the 1536 and
    3072 buckets mint it at their mid level), while the 2048/2560/3072
    tops each mint a unique shape.  Measured cost per fresh shape is
    30-60 s of one-time warmup through the relay, amortized by the
    persistent compile cache + AOT engine export (PERF.md round-5
    compile-surface table); 8 shapes is the deliberate budget for the
    MIN_SEQ=640 policy (matches TRT optimization-profile discipline,
    reference zipvoice/bin/tensorrt_export.py:112-133)."""
    from zipvoice_tpu.data import dataset as ds
    from zipvoice_tpu.infer import pipeline as pl
    from zipvoice_tpu.models.zipvoice import ZipVoice
    from zipvoice_tpu.ops.pallas_attention import MIN_SEQ_LEN, _row_tile

    for T in pl.FRAME_BUCKETS + ds.FRAME_BUCKETS:
        assert T % 8 == 0, T
        assert _row_tile(T) >= 8
    ds_factors = sorted(set(
        ZipVoice.fm_decoder_downsampling_factor
    ))  # (1, 2, 4)
    kernel_shapes = sorted({
        T // d
        for T in pl.FRAME_BUCKETS
        for d in ds_factors
        if T // d >= MIN_SEQ_LEN and (T // d) % 8 == 0
    })
    assert kernel_shapes, "no kernel-eligible level"
    for T in kernel_shapes:
        assert _row_tile(T) >= 128, (T, _row_tile(T))
    # each fresh kernel shape costs a long Mosaic compile over the relay
    # (~30-60 s warmup, PERF.md): keep the total surface bounded
    assert len(kernel_shapes) <= 8, kernel_shapes
    assert kernel_shapes == [640, 768, 1024, 1280, 1536, 2048, 2560, 3072]
