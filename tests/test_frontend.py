"""Host-side frontend: normalizers, tokenizer mechanics, audio DSP, chunking."""

import numpy as np

import conftest  # noqa: F401


def test_number_to_words():
    from zipvoice_tpu.frontend.normalizer import (
        number_to_words,
        ordinal_words,
        year_to_words,
    )

    assert number_to_words(0) == "zero"
    assert number_to_words(14) == "fourteen"
    assert number_to_words(42) == "forty-two"
    assert number_to_words(100) == "one hundred"
    assert number_to_words(101) == "one hundred and one"
    assert number_to_words(101, andword="") == "one hundred one"
    assert number_to_words(1234567, andword="") == (
        "one million, two hundred thirty-four thousand, five hundred sixty-seven"
    )
    assert ordinal_words(21) == "twenty-first"
    assert ordinal_words(3) == "third"
    assert ordinal_words(12) == "twelfth"
    assert ordinal_words(30) == "thirtieth"
    assert year_to_words(1999) == "nineteen ninety-nine"
    assert year_to_words(2019) == "twenty nineteen"


def test_english_normalizer():
    from zipvoice_tpu.frontend.normalizer import EnglishTextNormalizer

    n = EnglishTextNormalizer()

    def norm(s):
        return " ".join(n.normalize(s).split())

    assert norm("Dr. Smith") == "doctor. Smith"
    assert "five dollars" in norm("$5 bill")
    assert "three point five" in norm("3.5 units")
    assert "fifty percent" in norm("50% off")
    assert "one half" in norm("1/2 cup")
    assert "twenty-first" in norm("21st century")
    out = norm("mr king, 5 years, from 2019 to 2024.")
    assert "mister" in out and "five years" in out
    assert "twenty nineteen" in out and "twenty twenty-four" in out


def test_chinese_normalizer():
    from zipvoice_tpu.frontend.normalizer import ChineseTextNormalizer

    n = ChineseTextNormalizer()
    assert n.normalize("我有5个") == "我有五个"
    assert n.normalize("90") == "九十"
    assert n.normalize("123") == "一百二十三"
    assert n.normalize("1005") == "一千零五"
    assert n.normalize("3.14") == "三点一四"
    assert n.normalize("10") == "十"


def test_split_pinyin():
    from zipvoice_tpu.frontend.tokenizer import split_pinyin

    assert split_pinyin("yang2") == ["y0", "ang2"]
    assert split_pinyin("zhong1") == ["zh0", "ong1"]
    assert split_pinyin("an4") == ["an4"]
    assert split_pinyin("le") == ["le5"][:1] or split_pinyin("le") == ["l0", "e5"]
    assert split_pinyin("shi4") == ["sh0", "i4"]


def test_emilia_segmentation():
    from zipvoice_tpu.frontend.tokenizer import EmiliaTokenizer

    tok = EmiliaTokenizer()
    segs = tok.get_segment("我们是小米人,是吗? Yes I think so!霍...啦啦啦")
    langs = [lang for _, lang in segs]
    assert langs[0] == "zh" and "en" in langs
    # pinyin override + tag passthrough
    segs2 = tok.get_segment("超过90%的人<le5>[laugh]啦")
    kinds = [lang for _, lang in segs2]
    assert "pinyin" in kinds and "tag" in kinds


def test_token_file_roundtrip(tmp_path):
    from zipvoice_tpu.frontend.tokenizer import SimpleTokenizer

    f = tmp_path / "tokens.txt"
    f.write_text("_\t0\na\t1\nb\t2\nc\t3\n")
    tok = SimpleTokenizer(str(f))
    assert tok.pad_id == 0 and tok.vocab_size == 4
    assert tok.texts_to_token_ids(["abcx"]) == [[1, 2, 3]]  # OOV skipped


def test_chunk_tokens_punctuation():
    from zipvoice_tpu.frontend.text_chunking import chunk_tokens_punctuation

    tokens = list("hello, this is a test. and another sentence here!")
    chunks = chunk_tokens_punctuation(tokens, max_tokens=30)
    assert sum(len(c) for c in chunks) == len(tokens)
    assert all(len(c) <= 30 or len(c) == len(chunks[-1]) for c in chunks)


def test_batchify_tokens():
    from zipvoice_tpu.frontend.text_chunking import batchify_tokens

    tokens = [[1] * 10, [2] * 3, [3] * 7, [4] * 5]
    batches, index = batchify_tokens(
        tokens, max_duration=20, prompt_duration=2, token_duration=1
    )
    flat = [t for b in batches for t in b]
    assert len(flat) == 4
    assert sorted(index) == [0, 1, 2, 3]
    # sorted ascending by length
    assert [len(t) for t in flat] == sorted(len(t) for t in tokens)


def test_remove_silence_and_crossfade():
    from zipvoice_tpu.frontend.audio import (
        cross_fade_concat,
        remove_silence,
        rms_norm,
    )

    sr = 24000
    tone = 0.3 * np.sin(
        2 * np.pi * 440 * np.arange(sr, dtype=np.float32) / sr
    )
    sil = np.zeros(2 * sr, np.float32)
    audio = np.concatenate([sil, tone, sil, tone, sil])[None]
    out = remove_silence(audio, sr)
    # 2s leading + ~2s interior + 2s trailing silence must shrink a lot
    assert out.shape[-1] < audio.shape[-1] - 2 * sr
    assert out.shape[-1] >= 2 * sr  # both tones still present

    w, rms = rms_norm(0.01 * tone[None], target_rms=0.1)
    assert abs(np.sqrt(np.mean(w ** 2)) - 0.1) < 1e-3

    a, b = tone[None, : sr // 2], tone[None, : sr // 2]
    cat = cross_fade_concat([a, b], fade_duration=0.1, sample_rate=sr)
    assert cat.shape[-1] == a.shape[-1] + b.shape[-1] - int(0.1 * sr)


def test_wav_io_roundtrip(tmp_path):
    from zipvoice_tpu.frontend.audio import load_wav, save_wav

    sr = 24000
    wav = (0.5 * np.sin(np.linspace(0, 800, sr))).astype(np.float32)[None]
    p = str(tmp_path / "t.wav")
    save_wav(p, wav, sr)
    back = load_wav(p, sr)
    assert back.shape[0] == 1
    np.testing.assert_allclose(back[:, :100], wav[:, :100], atol=1e-3)


def test_resample():
    from zipvoice_tpu.frontend.audio import resample

    sr_in, sr_out = 16000, 24000
    t = np.arange(sr_in, dtype=np.float32) / sr_in
    wav = np.sin(2 * np.pi * 100 * t)[None]
    out = resample(wav, sr_in, sr_out)
    assert abs(out.shape[-1] - sr_out) < 4


# ---------------------------------------------------------------------------
# Chinese G2P fallback (frontend/zh_g2p.py)
# ---------------------------------------------------------------------------


def test_zh_g2p_basic():
    from zipvoice_tpu.frontend.zh_g2p import PinyinLexicon

    lex = PinyinLexicon()
    # multi-char word entries win over per-char readings (银行: hang2 not xing2)
    assert lex.g2p("银行") == ["yin2", "hang2"]
    assert lex.g2p("行为") == ["xing2", "wei2"]
    assert lex.g2p("中国") == ["zhong1", "guo2"]
    # neutral tone with five
    assert lex.g2p("我们") == ["wo3", "men5"]
    # unknown chars pass through verbatim
    out = lex.g2p("中鿿国")
    assert out == ["zhong1", "鿿", "guo2"]


def test_zh_g2p_tone_sandhi():
    from zipvoice_tpu.frontend.zh_g2p import PinyinLexicon

    lex = PinyinLexicon()
    # third-tone sandhi inside a word: ni3 hao3 -> ni2 hao3
    assert lex.g2p("你好") == ["ni2", "hao3"]
    # 不 + tone4 -> bu2
    assert lex.g2p("不是")[0] == "bu2"
    # 不 + non-4 stays bu4
    assert lex.g2p("不能")[0] == "bu4"
    # 一 + tone4 -> yi2 ; 一 + tone1/2/3 -> yi4
    assert lex.g2p("一次")[0] == "yi2"
    assert lex.g2p("一天")[0] == "yi4"


def test_zh_g2p_lexicon_file(tmp_path):
    from zipvoice_tpu.frontend.zh_g2p import PinyinLexicon

    # TSV format
    tsv = tmp_path / "lex.tsv"
    tsv.write_text("魑魅\tchi1 mei4\n", encoding="utf-8")
    lex = PinyinLexicon(str(tsv))
    assert lex.g2p("魑魅") == ["chi1", "mei4"]
    # CC-CEDICT format (traditional simplified [pinyin] /defs/)
    ced = tmp_path / "cedict.u8"
    ced.write_text(
        "# comment\n"
        "魍魎 魍魉 [wang3 liang3] /demons/\n"
        "綠 绿 [lu:4] /green/\n",
        encoding="utf-8",
    )
    lex2 = PinyinLexicon(str(ced))
    # third-tone sandhi applies to the loaded word
    assert lex2.g2p("魍魉") == ["wang2", "liang3"]
    # u: -> v normalization
    assert lex2.g2p("绿") == ["lv4"]


def test_emilia_tokenizer_zh_without_pypinyin():
    # pypinyin is not installed in this image, so the tokenizer exercises
    # the zh_g2p fallback: hanzi -> pinyin -> initial0/final-tone split
    from zipvoice_tpu.frontend.tokenizer import EmiliaTokenizer

    tok = EmiliaTokenizer()
    toks = tok.texts_to_tokens(["你好"])[0]
    assert toks == ["n0", "i2", "h0", "ao3"]
