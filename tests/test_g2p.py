"""First-party G2P contracts (VERDICT round-2 Next #1 and #5).

English: zipvoice_tpu/frontend/en_g2p.py replaces piper-phonemize/espeak
(reference zipvoice/tokenizer/tokenizer.py:32-39,160) — real phoneme output
in espeak conventions, deterministic, closed over the espeak IPA token
inventory.

Chinese: zipvoice_tpu/frontend/zh_g2p.py + data/pinyin_groups.txt replace
jieba+pypinyin (reference tokenizer.py:324-367) — full-coverage single-char
table (+ word seed for polyphones), 0 OOV on realistic sentences.
"""

import os

import pytest

import conftest  # noqa: F401


# --------------------------------------------------------------------------
# English
# --------------------------------------------------------------------------


def test_en_lexicon_closed_over_inventory():
    from zipvoice_tpu.frontend.en_g2p import ESPEAK_IPA_CODEPOINTS, _lexicon

    inv = set(ESPEAK_IPA_CODEPOINTS)
    for word, ipa in _lexicon().items():
        for c in ipa:
            assert c in inv, (word, ipa, c)


def test_en_lts_closed_over_inventory():
    """LTS output for arbitrary alphabetic input stays in-inventory."""
    import itertools
    import random

    from zipvoice_tpu.frontend.en_g2p import (
        ESPEAK_IPA_CODEPOINTS,
        word_to_ipa,
    )

    inv = set(ESPEAK_IPA_CODEPOINTS)
    rng = random.Random(0)
    letters = "abcdefghijklmnopqrstuvwxyz"
    words = ["".join(rng.choice(letters) for _ in range(rng.randint(1, 12)))
             for _ in range(300)]
    words += ["strengths", "queueing", "rhythm", "yacht", "gnocchi"]
    for w in words:
        for c in word_to_ipa(w):
            assert c in inv, (w, word_to_ipa(w), c)


def test_en_phoneme_output_is_phonemic_and_stressed():
    from zipvoice_tpu.frontend.en_g2p import EnglishG2P

    g = EnglishG2P()
    out = g.phonemize("hello world.")
    assert len(out) == 1
    joined = "".join(out[0])
    assert joined == "həlˈoʊ wˈɜːld."
    # stress mark sits immediately before a vowel (espeak placement)
    idx = out[0].index("ˈ")
    assert out[0][idx + 1] in set("oʊɜaiɛuæɑɔə")


def test_en_clause_split_and_punct():
    from zipvoice_tpu.frontend.en_g2p import EnglishG2P

    out = EnglishG2P().phonemize("Hello, world! fine?")
    assert [c[-1] for c in out] == [",", "!", "?"]


def test_en_morphology():
    from zipvoice_tpu.frontend.en_g2p import word_to_ipa

    # -s voicing assimilation
    assert word_to_ipa("cats").endswith("ts")
    assert word_to_ipa("dogs").endswith("ɡz")
    assert word_to_ipa("boxes").endswith("ᵻz")
    # -ed voicing assimilation
    assert word_to_ipa("walked").endswith("kt")
    assert word_to_ipa("loved").endswith("vd")
    assert word_to_ipa("wanted").endswith("ᵻd") or word_to_ipa(
        "wanted"
    ).endswith("ɾᵻd")
    # possessive
    assert word_to_ipa("john's").endswith("z")


def test_en_acronym_spellout():
    from zipvoice_tpu.frontend.en_g2p import EnglishG2P

    out = EnglishG2P().phonemize("use the GPU")
    joined = "".join(out[0])
    assert "dʒˈiːpˈiːjˈuː" in joined


def test_en_deterministic():
    from zipvoice_tpu.frontend.en_g2p import EnglishG2P

    text = "The quick brown fox jumps over the lazy dog!"
    a = EnglishG2P().phonemize(text)
    b = EnglishG2P().phonemize(text)
    assert a == b


def test_en_g2p_is_default_backend_without_espeak():
    from zipvoice_tpu.frontend.en_g2p import EnglishG2P
    from zipvoice_tpu.frontend.g2p import EspeakG2P, get_g2p

    backend = get_g2p("en-us")
    assert isinstance(backend, (EnglishG2P, EspeakG2P))


# --------------------------------------------------------------------------
# Chinese
# --------------------------------------------------------------------------


def _char_freq_from_jieba():
    import collections

    jieba = pytest.importorskip("jieba")
    freq = collections.Counter()
    with open(
        os.path.join(os.path.dirname(jieba.__file__), "dict.txt"),
        encoding="utf-8",
    ) as f:
        for line in f:
            w, c, _ = line.split()
            for ch in w:
                if "一" <= ch <= "鿿":
                    freq[ch] += int(c)
    return freq


def test_zh_char_coverage():
    """VERDICT round-2 Next #5: comprehensive single-char pinyin table.
    top-1000 jieba-frequency chars: 100%; top-2000: >= 99% (the remainder
    of jieba's own frequency list is mojibake noise in its dict)."""
    from zipvoice_tpu.frontend.zh_g2p import default_lexicon

    lex = default_lexicon()
    assert sum(1 for k in lex.table if len(k) == 1) >= 3500
    freq = _char_freq_from_jieba()
    top = [ch for ch, _ in freq.most_common(2000)]
    missing_1k = [ch for ch in top[:1000] if ch not in lex.table]
    assert missing_1k == [], missing_1k
    missing_2k = [ch for ch in top if ch not in lex.table]
    assert len(missing_2k) <= 20, missing_2k


def test_zh_syllables_map_to_valid_tokens():
    """Every reading in the table splits into initial/final tokens that the
    emilia vocabulary generator emits (split_pinyin output space)."""
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "egs", "zipvoice", "local"),
    )
    from build_emilia_tokens import FINALS, INITIALS

    from zipvoice_tpu.frontend.tokenizer import split_pinyin
    from zipvoice_tpu.frontend.zh_g2p import default_lexicon

    valid = set("_")
    valid |= {i + "0" for i in INITIALS}
    valid |= {f + str(t) for f in FINALS for t in range(1, 6)}
    for word, readings in default_lexicon().table.items():
        for r in readings:
            for tok in split_pinyin(r):
                assert tok in valid, (word, r, tok)


def test_zh_sentences_zero_oov():
    """Realistic zh sentences tokenize with zero OOV syllables (every
    output token is pinyin-splittable or punctuation)."""
    from zipvoice_tpu.frontend.tokenizer import EmiliaTokenizer

    tk = EmiliaTokenizer()
    sentences = [
        "你好世界。",
        "我们在学习语音合成技术。",
        "他说：一起去北京旅游吧！",
        "尴尬的气氛让人无法呼吸。",
        "今天天气真不错，我们出去散步好吗？",
        "人工智能正在改变世界的运行方式。",
        "请把这份文件翻译成中文。",
        "火车站离机场大约三十公里。",
    ]
    punct = set(",.!?;:'\"-… ()")
    for s in sentences:
        tokens = tk.texts_to_tokens([s])[0]
        assert tokens, s
        for t in tokens:
            ok = t in punct or (
                t[-1] in "012345" and t[:-1].isascii() and t[:-1].isalpha()
            )
            assert ok, (s, t)


def test_zh_sandhi_word_level():
    from zipvoice_tpu.frontend.zh_g2p import default_lexicon

    lex = default_lexicon()
    # 不 + tone4 -> bu2 (across jieba word boundary)
    assert lex.g2p_words(["不", "去"]) == ["bu2", "qu4"]
    # 一 + tone4 -> yi2 ; 一 + tone1/2/3 -> yi4
    assert lex.g2p_words(["一定"]) == ["yi2", "ding4"]
    assert lex.g2p_words(["一", "天"]) == ["yi4", "tian1"]
    # third-tone sandhi word-internal
    assert lex.g2p_words(["你好"]) == ["ni2", "hao3"]
