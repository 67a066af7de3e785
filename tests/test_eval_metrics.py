"""Eval metric math: WER alignment, cpWER permutation, cosine sim."""

import numpy as np

import conftest  # noqa: F401

from zipvoice_tpu.eval.metrics import (
    corpus_wer,
    cosine_similarity,
    cpwer,
    edit_distance,
    normalize_text,
    split_speakers,
    wer,
)


def test_edit_distance():
    d = edit_distance("abc", "abc")
    assert d["errors"] == 0
    d = edit_distance(list("kitten"), list("sitting"))
    assert d["errors"] == 3
    d = edit_distance(["a", "b"], ["a", "x", "b"])
    assert d["errors"] == 1 and d["ins"] == 1


def test_wer():
    d = wer("Hello, world!", "hello world")
    assert d["wer"] == 0.0
    d = wer("the cat sat", "the cat sit down")
    assert d["errors"] == 2  # 1 sub + 1 ins
    assert abs(d["wer"] - 2 / 3) < 1e-9
    assert corpus_wer([("a b", "a b"), ("a b", "a x")]) == 0.25


def test_normalize_zh():
    assert normalize_text("你好 世界", "zh") == ["你", "好", "世", "界"]


def test_split_speakers_and_cpwer():
    text = "[S1] hello there [S2] hi [S1] bye"
    spk = split_speakers(text)
    assert spk["[S1]"] == "hello there bye"
    assert spk["[S2]"] == "hi"
    # swapped speakers should still give 0 under permutation
    ref = "[S1] hello there [S2] good morning"
    hyp = "[S1] good morning [S2] hello there"
    assert cpwer(ref, hyp) == 0.0
    assert cpwer(ref, ref) == 0.0


def test_cosine_similarity():
    a = np.array([1.0, 0.0])
    assert abs(cosine_similarity(a, a) - 1.0) < 1e-9
    assert abs(cosine_similarity(a, np.array([0.0, 1.0]))) < 1e-9


def test_structural_loaders():
    from zipvoice_tpu.utils.structural_loaders import (
        copy_proj_three_channel,
        extend_vocab,
    )

    rng = np.random.RandomState(0)
    F, D = 4, 6
    params = {
        "embed": {"embedding": rng.randn(10, 8).astype(np.float32)},
        "fm_decoder": {
            "in_proj": {
                "kernel": rng.randn(3 * F, D).astype(np.float32),
                "bias": rng.randn(D).astype(np.float32),
            },
            "out_proj": {
                "kernel": rng.randn(D, F).astype(np.float32),
                "bias": rng.randn(F).astype(np.float32),
            },
        },
    }
    out = extend_vocab(params, 14, feat_dim=F)
    assert out["embed"]["embedding"].shape == (14, 8)
    np.testing.assert_array_equal(
        out["embed"]["embedding"][:10], params["embed"]["embedding"]
    )
    assert out["spk_embed"]["embedding"].shape == (2, F)

    out2 = copy_proj_three_channel(out, feat_dim=F)
    fm = out2["fm_decoder"]
    assert fm["in_proj_0"]["kernel"].shape == (5 * F, D)
    assert fm["out_proj_0"]["kernel"].shape == (D, 2 * F)
    np.testing.assert_array_equal(
        fm["in_proj_1"]["kernel"], params["fm_decoder"]["in_proj"]["kernel"]
    )
    # split halves reconstruct: first two F-blocks sum to original xt block
    k0 = fm["in_proj_0"]["kernel"]
    np.testing.assert_allclose(
        k0[:F] + k0[F : 2 * F],
        params["fm_decoder"]["in_proj"]["kernel"][:F],
        rtol=1e-6,
    )


def test_post_process_matches_reference_algorithm():
    """Our pre-scoring normalization equals the reference's post_process
    (eval/wer/seedtts.py:128-151) run with the same punctuation table —
    the reference module itself needs funasr/zhon/jiwer, so its deps are
    stubbed and our embedded CJK punctuation set is injected as
    zhon.hanzi.punctuation."""
    import sys
    import types

    from zipvoice_tpu.eval.metrics import _CJK_PUNCT, post_process

    added = []  # stubs are removed afterwards — leaking a fake 'soundfile'
    # or 'scipy' into sys.modules breaks frontend/audio in later tests
    if "zipvoice.eval.wer.seedtts" not in sys.modules:
        for name, attrs in (
            ("funasr", {"AutoModel": object}),
            ("jiwer", {"compute_measures": lambda *a: {}}),
            ("soundfile", {"read": lambda *a: None}),
            ("zhconv", {"convert": lambda t, v: t}),
            ("scipy", {}),
            ("scipy.signal", {"resample": lambda *a: None}),
            ("tqdm", {"tqdm": lambda x: x}),
        ):
            try:
                __import__(name)  # only stub genuinely-missing deps
            except ImportError:
                import importlib.machinery

                m = types.ModuleType(name)
                m.__spec__ = importlib.machinery.ModuleSpec(name, None)
                for k, v in attrs.items():
                    setattr(m, k, v)
                sys.modules[name] = m
                added.append(name)
        zhon = types.ModuleType("zhon")
        hanzi = types.ModuleType("zhon.hanzi")
        # strip the ASCII stops we appended; zhon's table is the CJK part
        hanzi.punctuation = _CJK_PUNCT
        zhon.hanzi = hanzi
        for name, mod in (("zhon", zhon), ("zhon.hanzi", hanzi)):
            if name not in sys.modules:
                sys.modules[name] = mod
                added.append(name)

    try:
        from zipvoice.eval.wer.seedtts import post_process as ref_pp

        cases = [
            ("Hello, World! It's co-op; fine?", "en"),
            ("The  quick... brown 'fox'!", "en"),
            ("你好，世界！“引用”……完。", "zh"),
            ("中文 with English mixed, ok?", "zh"),
            ("no punct here", "en"),
        ]
        for text, lang in cases:
            assert post_process(text, lang) == ref_pp(text, lang), (
                text, lang,
            )
    finally:
        for name in added:
            sys.modules.pop(name, None)
