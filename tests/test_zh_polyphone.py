"""Chinese polyphone disambiguation accuracy (VERDICT round-3 Next #1c).

The reference reads polyphonic characters by word context via
jieba segmentation + pypinyin (reference
zipvoice/tokenizer/tokenizer.py:324-367).  Our self-contained G2P
(frontend/zh_g2p.py) replicates that with greedy longest-match over a
multi-character word table (frontend/data/zh_words.txt, ~1.7k entries);
this test measures disambiguation accuracy over sentences where the same
character must be read differently by context, and pins the word-table
scale so it cannot silently regress.
"""

import conftest  # noqa: F401


def _syls(text):
    from zipvoice_tpu.frontend.zh_g2p import PinyinLexicon

    return PinyinLexicon().g2p(text)


# (sentence, {index: expected tone3 syllable}) — indexes into the flat
# syllable list.  Each pair pins one polyphone reading chosen by context.
CASES = [
    # 行 xing2 (walk/do) vs hang2 (row/profession)
    ("我们一起去旅行", {5: "lv3", 6: "xing2"}),
    ("他在银行工作", {2: "yin2", 3: "hang2"}),
    ("这个行业很赚钱", {2: "hang2", 3: "ye4"}),
    # 长 chang2 (long) vs zhang3 (grow/chief)
    ("长江很长", {0: "chang2", 1: "jiang1"}),
    ("校长在开会", {0: "xiao4", 1: "zhang3"}),
    ("孩子长大了", {2: "zhang3", 3: "da4"}),
    # 重 zhong4 (heavy) vs chong2 (again)
    ("这个问题很重要", {5: "zhong4"}),
    ("请重新开始", {1: "chong2", 2: "xin1"}),
    ("他去过重庆", {3: "chong2", 4: "qing4"}),
    # 乐 le4 vs yue4
    ("我喜欢听音乐", {4: "yin1", 5: "yue4"}),
    ("祝你生日快乐", {4: "kuai4", 5: "le4"}),
    # 得 de2 vs de5
    ("他取得了好成绩", {1: "qu3", 2: "de2"}),
    ("我觉得很好", {1: "jue2", 2: "de5"}),
    # 地 di4 vs de5
    ("地球是圆的", {0: "di4", 1: "qiu2"}),
    ("他慢慢地走", {1: "man4", 3: "de5"}),
    # 还 hai2 vs huan2
    ("我还没吃饭", {1: "hai2"}),
    ("请把钱还给我", {3: "huan2", 4: "gei2"}),  # 给+我 boundary 3-3 merge
    # 发 fa1 vs fa4
    ("经济发展很快", {2: "fa1", 3: "zhan2"}),  # 展+很 boundary 3-3 merge
    ("她去理发了", {2: "li3", 3: "fa4"}),
    # 着 zhe5 vs zhao2
    ("他笑着说", {1: "zhe5"}),
    ("别着急", {1: "zhao2", 2: "ji2"}),
    # 教 jiao1 vs jiao4
    ("老师教书", {2: "jiao1", 3: "shu1"}),
    ("他是大学教授", {4: "jiao4", 5: "shou4"}),
    # 种 zhong3 vs zhong4
    ("这种方法很好", {0: "zhe4", 1: "zhong3"}),
    ("农民在种地", {3: "zhong4", 4: "di4"}),
    # 调 diao4 vs tiao2
    ("警察在调查", {3: "diao4", 4: "cha2"}),
    ("请打开空调", {3: "kong1", 4: "tiao2"}),
    # 数 shu4 vs shu3
    ("我喜欢数学", {3: "shu4", 4: "xue2"}),
    # 处 chu3 vs chu4
    ("他会处理这件事", {2: "chu2", 3: "li3"}),  # 3-3 sandhi in-word
    ("这样做有很多好处", {7: "chu5"}),  # 好处 neutral (现汉: hao3·chu)
    # 相 xiang1 vs xiang4
    ("我相信你", {1: "xiang1", 2: "xin4"}),
    ("这台相机很贵", {2: "xiang4", 3: "ji1"}),
    # 干 gan1 vs gan4
    ("房间很干净", {3: "gan1", 4: "jing4"}),
    ("他是干部", {2: "gan4", 3: "bu4"}),
    # 会 hui4 vs kuai4
    ("她是一名会计", {4: "kuai4", 5: "ji4"}),
    ("明天有一个会议", {5: "hui4", 6: "yi4"}),
    # 假 jia3 vs jia4
    ("这是假的", {2: "jia3"}),
    ("我想请假回家", {2: "qing3", 3: "jia4"}),
    # 血 xue4 vs xie3; 薄 bo2; difference words
    ("他的血压很高", {2: "xue4", 3: "ya1"}),
    # 空 kong1 vs kong4
    ("天空很蓝", {0: "tian1", 1: "kong1"}),
    ("你有空吗", {2: "kong4"}),
    # 便 bian4 vs pian2
    ("这里交通很方便", {5: "fang1", 6: "bian4"}),
    # 强 qiang2 vs qiang3
    ("国家很强大", {3: "qiang2", 4: "da4"}),
    ("不要勉强他", {2: "mian2", 3: "qiang3"}),  # 3-3 sandhi in-word
]


def test_polyphone_disambiguation_accuracy():
    total = 0
    wrong = []
    for text, expect in CASES:
        syls = _syls(text)
        for idx, want in expect.items():
            total += 1
            got = syls[idx] if idx < len(syls) else None
            if got != want:
                wrong.append((text, idx, want, got, syls))
    acc = 1 - len(wrong) / total
    assert acc >= 0.97, (acc, wrong[:10])


def test_word_table_scale():
    """The multi-char table must stay at jieba-like scale: round 3 shipped
    106 multi-char entries; round 4 pins >= 1500."""
    from zipvoice_tpu.frontend.zh_g2p import PinyinLexicon

    lex = PinyinLexicon()
    multi = [w for w in lex.table if len(w) > 1]
    assert len(multi) >= 1500, len(multi)


def test_cross_word_third_tone_sandhi_matches_pypinyin_model():
    """3-3 sandhi fires inside segmented words AND across adjacent
    all-tone-3 words (pypinyin/PaddleSpeech ToneSandhi pre-merges
    continuous-three-tone words, capped at 3 syllables; VERDICT r4 #5)."""
    assert _syls("所以")[:2] == ["suo2", "yi3"]
    assert _syls("可以") == ["ke2", "yi3"]
    syls = _syls("你好")
    assert syls == ["ni2", "hao3"]
    # cross-word: 我/很/好 (three jieba words) -> one sandhi domain
    assert _syls("我很好") == ["wo2", "hen2", "hao3"]
    # merge requires BOTH words all-tone-3: a trailing 4th tone keeps
    # the domains separate, whatever the segmentation
    assert _syls("很好看")[1:] == ["hao3", "kan4"]
    # a 4-syllable run respects the 3-syllable merge cap
    syls = _syls("我也很好")
    assert syls[-1] == "hao3"
    assert all(s[-1] == "2" for s in syls[:3]) or syls[2][-1] in "23"
