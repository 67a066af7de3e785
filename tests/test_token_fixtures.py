"""Token-id front-door contract: our tokenizers reproduce the committed
reference-generated fixtures exactly (VERDICT round-1 Missing #2).

Fixtures were produced by tools/dump_reference_tokens.py running the ACTUAL
reference tokenizer (see that script for the dependency stubbing story).
Cases marked "espeak" were generated with a deterministic fake phonemizer
(one token per character of the normalized English text); we inject the
same fake here, so those cases verify the normalizer + segmentation +
assembly unconditionally.  Cases marked "real_espeak" additionally require
libespeak and are skipped when it is absent.  Pinyin / tag / dialog /
punctuation cases run with no substitutions at all.
"""

import json
import os

import pytest

import conftest  # noqa: F401

FIXTURES = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "fixtures", "reference_tokens.json",
)


def fake_phonemize_espeak(text, voice):
    # must mirror tools/dump_reference_tokens.py
    return [list(text)]


def _load():
    with open(FIXTURES) as f:
        return json.load(f)["fixtures"]


def _tokenizer(kind):
    from zipvoice_tpu.frontend.tokenizer import (
        DialogTokenizer,
        EmiliaTokenizer,
        EspeakTokenizer,
        SimpleTokenizer,
    )

    return {
        "emilia": EmiliaTokenizer,
        "dialog": DialogTokenizer,
        "espeak": lambda: EspeakTokenizer(lang="en-us"),
        "simple": SimpleTokenizer,
    }[kind]()


@pytest.mark.parametrize(
    "case", _load(), ids=lambda c: c["name"]
)
def test_token_fixture(case, monkeypatch):
    import zipvoice_tpu.frontend.tokenizer as tok_mod

    if case.get("real_espeak"):
        from zipvoice_tpu.frontend.g2p import espeak_available

        if not espeak_available():
            pytest.skip("libespeak-ng not present")
    elif case.get("espeak"):
        monkeypatch.setattr(
            tok_mod, "phonemize_espeak", fake_phonemize_espeak
        )

    tk = _tokenizer(case["tokenizer"])
    tokens = tk.texts_to_tokens([case["text"]])[0]
    assert tokens == case["tokens"], (
        f"{case['name']}: {tokens} != {case['tokens']}"
    )


def test_fixture_coverage():
    """The committed corpus covers every advertised surface."""
    names = {c["name"] for c in _load()}
    for required in (
        "pinyin_pure", "pinyin_neutral", "tag_simple", "tag_only",
        "dialog_two_turns", "dialog_pinyin", "pinyin_punct",
        "en_plain", "en_abbrev", "simple_chars",
    ):
        assert required in names, required
