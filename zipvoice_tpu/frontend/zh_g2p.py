"""Self-contained Chinese grapheme-to-phoneme (hanzi -> tone3 pinyin).

The reference tokenizer (zipvoice/tokenizer/tokenizer.py:324-367) uses
jieba word segmentation + pypinyin ``lazy_pinyin(style=TONE3,
tone_sandhi=True, neutral_tone_with_five=True)``.  Neither package ships
in this image, so this module provides the same contract from a lexicon:

- **Greedy longest-match segmentation** over a word->readings lexicon
  (covers jieba's role: multi-char entries disambiguate polyphones).
- **Tone sandhi** (the standard subset pypinyin applies): third-tone
  sandhi (3 3 -> 2 3), 不 (bu4 -> bu2 before tone 4), 一 (yi1 -> yi4
  before tones 1/2/3, yi2 before tone 4) — applied word-internally,
  like pypinyin's word-based ToneSandhi.
- **Neutral tone as '5'** (neutral_tone_with_five=True).

Lexicon sources, merged in order (later wins):
1. the built-in seed lexicon below (high-frequency chars/words — enough
   for tests and demos, NOT full coverage);
2. a file passed explicitly or via $ZIPVOICE_PINYIN_LEXICON.  Two formats
   auto-detected per line:
     - TSV:        word<TAB>py1 py2 ...        (tone3, e.g. "中国\tzhong1 guo2")
     - CC-CEDICT:  trad simp [pin1 yin1] /.../  (the freely available dict)

When pypinyin IS importable the tokenizer prefers it (exact reference
behavior); this module is the fallback and the offline-production path.
"""

import logging
import os
import re
from typing import Dict, List, Optional, Tuple

# ---------------------------------------------------------------------------
# Seed lexicon: high-frequency single characters.  tone3 style ("zhong1").
# Polyphonic characters carry their most common reading here; common
# multi-character words below override them in context.
# ---------------------------------------------------------------------------

_SEED_CHARS = """
的 de5   一 yi1   是 shi4   了 le5   我 wo3   不 bu4   人 ren2  在 zai4
他 ta1   有 you3  这 zhe4   个 ge4   上 shang4 们 men5  来 lai2  到 dao4
时 shi2  大 da4   地 di4    为 wei4  子 zi3   中 zhong1 你 ni3  说 shuo1
生 sheng1 国 guo2 年 nian2  着 zhe5  就 jiu4  那 na4   和 he2   要 yao4
她 ta1   出 chu1  也 ye3    得 de5   里 li3   后 hou4  自 zi4   以 yi3
会 hui4  家 jia1  可 ke3    下 xia4  而 er2   过 guo4  天 tian1 去 qu4
能 neng2 对 dui4  小 xiao3  多 duo1  然 ran2  于 yu2   心 xin1  学 xue2
么 me5   之 zhi1  都 dou1   好 hao3  看 kan4  起 qi3   发 fa1   当 dang1
没 mei2  成 cheng2 只 zhi3  如 ru2   事 shi4  把 ba3   还 hai2  用 yong4
第 di4   样 yang4 道 dao4   想 xiang3 作 zuo4 种 zhong3 开 kai1 美 mei3
总 zong3 从 cong2 无 wu2    情 qing2 己 ji3   面 mian4 最 zui4  女 nv3
但 dan4  现 xian4 前 qian2  些 xie1  所 suo3  同 tong2 日 ri4   手 shou3
又 you4  行 xing2 意 yi4    动 dong4 方 fang1 期 qi1   它 ta1   头 tou2
经 jing1 长 chang2 儿 er2   回 hui2  位 wei4  分 fen1  爱 ai4   老 lao3
因 yin1  很 hen3  给 gei3   名 ming2 法 fa3   间 jian1 斯 si1   知 zhi1
世 shi4  什 shen2 两 liang3 次 ci4   使 shi3  身 shen1 者 zhe3  被 bei4
高 gao1  已 yi3   亲 qin1   其 qi2   进 jin4  此 ci3   话 hua4  常 chang2
与 yu3   活 huo2  正 zheng4 感 gan3  见 jian4 明 ming2 问 wen4  力 li4
理 li3   尔 er3   点 dian3  文 wen2  几 ji3   定 ding4 本 ben3  公 gong1
特 te4   做 zuo4  外 wai4   孩 hai2  相 xiang1 西 xi1  果 guo3  走 zou3
将 jiang1 月 yue4 十 shi2   实 shi2  向 xiang4 声 sheng1 车 che1 全 quan2
信 xin4  重 zhong4 三 san1  机 ji1   工 gong1 物 wu4   气 qi4   每 mei3
并 bing4 别 bie2  真 zhen1  打 da3   太 tai4  新 xin1  比 bi3   才 cai2
便 bian4 夫 fu1   再 zai4   书 shu1  部 bu4   水 shui3 像 xiang4 眼 yan3
等 deng3 体 ti3   却 que4   加 jia1  电 dian4 主 zhu3  界 jie4  门 men2
利 li4   海 hai3  受 shou4  听 ting1 表 biao3 德 de2   少 shao3 克 ke4
代 dai4  员 yuan2 许 xu3    统 tong3 先 xian1 口 kou3  由 you2  死 si3
安 an1   写 xie3  性 xing4  马 ma3   光 guang1 白 bai2 或 huo4  住 zhu4
难 nan2  望 wang4 教 jiao4  命 ming4 花 hua1  结 jie2  乐 le4   色 se4
更 geng4 拉 la1   东 dong1  神 shen2 记 ji4   处 chu4  让 rang4 母 mu3
父 fu4   应 ying1 直 zhi2   字 zi4   场 chang3 平 ping2 报 bao4 友 you3
关 guan1 放 fang4 至 zhi4   张 zhang1 认 ren4 接 jie1  告 gao4  入 ru4
笑 xiao4 内 nei4  英 ying1  军 jun1  候 hou4  民 min2  岁 sui4  往 wang3
何 he2   度 du4   山 shan1  觉 jue2  路 lu4   带 dai4  万 wan4  男 nan2
边 bian1 风 feng1 解 jie3   叫 jiao4 任 ren4  金 jin1  快 kuai4 原 yuan2
吃 chi1  妈 ma1   变 bian4  通 tong1 师 shi1  立 li4   象 xiang4 数 shu4
四 si4   失 shi1  满 man3   战 zhan4 远 yuan3 格 ge2   士 shi4  音 yin1
轻 qing1 目 mu4   条 tiao2  呢 ne5   病 bing4 始 shi3  达 da2   深 shen1
完 wan2  今 jin1  提 ti2    求 qiu2  清 qing1 王 wang2 化 hua4  空 kong1
业 ye4   思 si1   切 qie4   怎 zen3  非 fei1  找 zhao3 片 pian4 罗 luo2
钱 qian2 吗 ma5   语 yu3    元 yuan2 喜 xi3   曾 ceng2 离 li2   飞 fei1
科 ke1   言 yan2  干 gan4   流 liu2  欢 huan1 约 yue1  各 ge4   即 ji2
指 zhi3  合 he2   反 fan3   题 ti2   必 bi4   该 gai1  论 lun4  交 jiao1
终 zhong1 林 lin2 请 qing3  医 yi1   晚 wan3  制 zhi4  球 qiu2  决 jue2
传 chuan2 画 hua4 保 bao3   读 du2   运 yun4  及 ji2   则 ze2   房 fang2
早 zao3  院 yuan4 量 liang4 苦 ku3   火 huo3  布 bu4   品 pin3  近 jin4
坐 zuo4  产 chan3 答 da2    星 xing1 精 jing1 视 shi4  五 wu3   连 lian2
司 si1   巴 ba1   奇 qi2    管 guan3 类 lei4  未 wei4  朋 peng2 且 qie3
婚 hun1  台 tai2  夜 ye4    青 qing1 北 bei3  队 dui4  久 jiu3  乎 hu1
越 yue4  观 guan1 落 luo4   尽 jin4  形 xing2 影 ying3 红 hong2 爸 ba4
百 bai3  令 ling4 周 zhou1  吧 ba5   识 shi2  步 bu4   希 xi1   亚 ya4
术 shu4  留 liu2  市 shi4   半 ban4  热 re4   送 song4 兴 xing4 造 zao4
谈 tan2  容 rong2 极 ji2    随 sui2  演 yan3  收 shou1 首 shou3 根 gen1
讲 jiang3 整 zheng3 式 shi4 取 qu3   照 zhao4 办 ban4  强 qiang2 石 shi2
古 gu3   华 hua2  谁 shei2  拿 na2   计 ji4   您 nin2  装 zhuang1 似 si4
足 zu2   双 shuang1 妻 qi1  尼 ni2   转 zhuan3 诉 su4  米 mi3   称 cheng1
规 gui1  音 yin1  建 jian4  摩 mo2   试 shi4  升 sheng1 忽 hu1  聊 liao2
照 zhao4 九 jiu3  六 liu4   七 qi1   八 ba1   二 er4   零 ling2 谢 xie4
""".split()

# Common multi-character words (polyphone disambiguation + natural
# segmentation).  Format: word reading1 reading2 ...
_SEED_WORDS = """
中国 zhong1 guo2
我们 wo3 men5
你们 ni3 men5
他们 ta1 men5
她们 ta1 men5
什么 shen2 me5
没有 mei2 you3
知道 zhi1 dao4
时候 shi2 hou5
现在 xian4 zai4
可以 ke3 yi3
自己 zi4 ji3
因为 yin1 wei4
所以 suo3 yi3
觉得 jue2 de5
东西 dong1 xi5
先生 xian1 sheng5
学生 xue2 sheng5
老师 lao3 shi1
朋友 peng2 you5
喜欢 xi3 huan1
漂亮 piao4 liang5
便宜 pian2 yi5
方便 fang1 bian4
还是 hai2 shi4
还有 hai2 you3
音乐 yin1 yue4
快乐 kuai4 le4
得到 de2 dao4
不得不 bu4 de2 bu4
长大 zhang3 da4
长城 chang2 cheng2
成长 cheng2 zhang3
银行 yin2 hang2
行为 xing2 wei2
为了 wei4 le5
认为 ren4 wei2
重要 zhong4 yao4
重新 chong2 xin1
地方 di4 fang5
大地 da4 di4
土地 tu3 di4
慢慢地 man4 man4 de5
好好地 hao3 hao3 de5
觉醒 jue2 xing3
睡觉 shui4 jiao4
教学 jiao1 xue2
教育 jiao4 yu4
只有 zhi3 you3
一只 yi1 zhi1
船只 chuan2 zhi1
发现 fa1 xian4
头发 tou2 fa4
今天 jin1 tian1
明天 ming2 tian1
昨天 zuo2 tian1
天气 tian1 qi4
汉语 han4 yu3
普通话 pu3 tong1 hua4
电话 dian4 hua4
电脑 dian4 nao3
电视 dian4 shi4
工作 gong1 zuo4
时间 shi2 jian1
问题 wen4 ti2
世界 shi4 jie4
生活 sheng1 huo2
非常 fei1 chang2
已经 yi3 jing1
虽然 sui1 ran2
但是 dan4 shi4
如果 ru2 guo3
于是 yu2 shi4
然后 ran2 hou4
开始 kai1 shi3
出现 chu1 xian4
历史 li4 shi3
文化 wen2 hua4
很多 hen3 duo1
大家 da4 jia1
回家 hui2 jia1
孩子 hai2 zi5
房子 fang2 zi5
妻子 qi1 zi5
儿子 er2 zi5
样子 yang4 zi5
身体 shen1 ti3
眼睛 yan3 jing5
高兴 gao1 xing4
兴趣 xing4 qu4
北京 bei3 jing1
上海 shang4 hai3
谢谢 xie4 xie5
再见 zai4 jian4
你好 ni3 hao3
晚上 wan3 shang5
早上 zao3 shang5
中午 zhong1 wu3
上午 shang4 wu3
下午 xia4 wu3
合成 he2 cheng2
语音 yu3 yin1
语音合成 yu3 yin1 he2 cheng2
模型 mo2 xing2
声音 sheng1 yin1
说话 shuo1 hua4
"""

_CEDICT_RE = re.compile(r"^(\S+)\s+(\S+)\s+\[([^\]]+)\]")


def _norm_cedict_syllable(syl: str) -> Optional[str]:
    """CC-CEDICT 'zhong1'/'lu:4'/'r5' -> tone3 'zhong1'/'lv4'/'r5'."""
    syl = syl.lower().replace("u:", "v").replace("ü", "v")
    if not syl:
        return None
    if syl[-1] in "12345":
        body, tone = syl[:-1], syl[-1]
    else:
        body, tone = syl, "5"
    if not body.isalpha():
        return None  # punctuation/markers inside the bracket
    return body + tone


class PinyinLexicon:
    """word -> [tone3 syllables], with greedy longest-match conversion."""

    def __init__(self, lexicon_file: Optional[str] = None,
                 use_seed: bool = True):
        self.table: Dict[str, List[str]] = {}
        self.max_len = 1
        if use_seed:
            it = iter(_SEED_CHARS)
            for ch, py in zip(it, it):
                self._add(ch, [py])
            for line in _SEED_WORDS.strip().splitlines():
                parts = line.split()
                self._add(parts[0], parts[1:])
            self._load_words()
            self._load_groups()
        lexicon_file = lexicon_file or os.environ.get(
            "ZIPVOICE_PINYIN_LEXICON"
        )
        if lexicon_file:
            self.load_file(lexicon_file)

    def _load_words(self):
        """Load the bundled multi-character word table
        (data/zh_words.txt: 'word py1 py2 ...' lines).  These entries are
        what gives segmentation jieba-like polyphone disambiguation
        (行/长/重/得/地/... read by word context, reference
        tokenizer.py:324-367).  The inline seed wins on conflicts."""
        path = os.path.join(
            os.path.dirname(__file__), "data", "zh_words.txt"
        )
        if not os.path.exists(path):
            return
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                if len(parts) == len(parts[0]) + 1 and parts[0] not in self.table:
                    self._add(parts[0], parts[1:])

    def _load_groups(self):
        """Load the bundled grouped reading table
        (data/pinyin_groups.txt: '<tone3 syllable> <chars>' lines).  The
        curated seed always wins; within the groups file the first listing
        of a char wins (dominant readings are listed under their most
        common syllable)."""
        path = os.path.join(
            os.path.dirname(__file__), "data", "pinyin_groups.txt"
        )
        if not os.path.exists(path):
            return
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                syl, _, chars = line.partition(" ")
                for ch in chars.strip():
                    if ch not in self.table:
                        self._add(ch, [syl])

    def _add(self, word: str, readings: List[str]):
        self.table[word] = readings
        self.max_len = max(self.max_len, len(word))

    def load_file(self, path: str):
        """Load a TSV (word<TAB>py1 py2 ...) or CC-CEDICT file."""
        n = 0
        loaded_this_file = set()
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                if "\t" in line:
                    word, readings = line.split("\t", 1)
                    sylls = readings.split()
                    if len(sylls) == len(word):
                        self._add(word, sylls)
                        n += 1
                    continue
                m = _CEDICT_RE.match(line)
                if m:
                    simp = m.group(2)
                    sylls = [
                        _norm_cedict_syllable(s)
                        for s in m.group(3).split()
                    ]
                    if None not in sylls and len(sylls) == len(simp):
                        # first file entry wins (CC-CEDICT lists common
                        # readings first); multi-char file entries may
                        # override the seed table but never earlier
                        # entries from the same file
                        if simp not in loaded_this_file and (
                            simp not in self.table or len(simp) > 1
                        ):
                            self._add(simp, sylls)
                            loaded_this_file.add(simp)
                            n += 1
        logging.info(f"pinyin lexicon: loaded {n} entries from {path}")

    # --- conversion ---------------------------------------------------------

    def segment(self, text: str) -> List[Tuple[str, Optional[List[str]]]]:
        """Greedy longest-match; unknown chars get reading None."""
        out = []
        i = 0
        while i < len(text):
            for ln in range(min(self.max_len, len(text) - i), 0, -1):
                cand = text[i : i + ln]
                if cand in self.table:
                    out.append((cand, list(self.table[cand])))
                    i += ln
                    break
            else:
                out.append((text[i], None))
                i += 1
        return out

    def g2p(self, text: str) -> List[str]:
        """hanzi string -> flat tone3 syllable list; unknown chars pass
        through verbatim (mirroring pypinyin's errors='default')."""
        words = self.segment(text)
        words = _context_adjust(words)
        words = apply_tone_sandhi(words)
        flat: List[str] = []
        for word, readings in words:
            flat.extend(readings if readings is not None else [word])
        return flat

    def lookup_word(self, word: str) -> List[str]:
        """Readings for one segmented word: exact lexicon hit, else
        greedy-match composition over its characters."""
        if word in self.table:
            return list(self.table[word])
        out: List[str] = []
        for part, readings in self.segment(word):
            # unknown chars pass through verbatim (pypinyin errors='default')
            out.extend(readings if readings is not None else [part])
        return out

    def g2p_words(self, words: List[str]) -> List[str]:
        """lazy_pinyin-compatible conversion of a pre-segmented word list
        (e.g. jieba output): non-han elements pass through verbatim
        (pypinyin keeps punctuation/spaces, reference tokenizer.py:298-316),
        han words are converted with word-based tone sandhi across the
        whole list (mirroring pypinyin's tone_sandhi=True)."""
        pairs: List[Tuple[str, Optional[List[str]]]] = []
        for w in words:
            if any("一" <= ch <= "鿿" for ch in w):
                pairs.append((w, self.lookup_word(w)))
            else:
                pairs.append((w, None))
        pairs = _context_adjust(pairs)
        pairs = apply_tone_sandhi(pairs)
        flat: List[str] = []
        for word, readings in pairs:
            flat.extend(readings if readings is not None else [word])
        return flat


# ---------------------------------------------------------------------------
# Context rules for single-character polyphones that word entries cannot
# disambiguate (the character stands alone as a segment).  These mirror
# what jieba+pypinyin get from POS-aware phrase dictionaries; measured on
# running text by tools/zh_stream.py.
# ---------------------------------------------------------------------------

# two-or-more-char words commonly followed by adverbial 地 (… de5)
_ADV_BEFORE_DI = {
    "认真", "努力", "仔细", "突然", "着急", "高兴", "兴奋", "激动",
    "小心", "偷偷", "不停", "飞快", "迅速", "热情", "友好", "安静",
    "清楚", "缓缓", "渐渐", "拼命", "用力", "大声", "小声", "耐心",
    "轻轻", "慢慢", "好好", "悄悄", "静静", "默默", "深深", "紧紧",
}

_PRONOUN_WORDS = {"我", "你", "他", "她", "它", "您", "咱",
                  "我们", "你们", "他们", "她们", "咱们", "大家"}

_DIGIT_HANZI = set("零一二三四五六七八九十百千万亿两")
_MEASURE_DETS = set("那这哪每几") | _DIGIT_HANZI


def _is_han_redup(w: str) -> bool:
    return len(w) == 2 and w[0] == w[1] and "一" <= w[0] <= "鿿"


def _context_adjust(
    words: List[Tuple[str, Optional[List[str]]]],
) -> List[Tuple[str, Optional[List[str]]]]:
    """Adjust single-char polyphone segments by neighboring segments.
    Runs after segmentation, before tone sandhi."""
    out = list(words)
    for i, (w, r) in enumerate(out):
        if r is None:
            continue
        prev_w = out[i - 1][0] if i > 0 else ""
        next_w = out[i + 1][0] if i + 1 < len(out) else ""
        prev2_w = out[i - 2][0] if i > 1 else ""
        if w == "地" and (_is_han_redup(prev_w)
                          or prev_w in _ADV_BEFORE_DI
                          # redup split into two single-char segments
                          or (len(prev_w) == 1 and prev_w == prev2_w
                              and "一" <= prev_w <= "鿿")):
            out[i] = ("地", ["de5"])  # adverbial particle
        elif (len(w) >= 3 and w.endswith("地") and len(r) == len(w)
              and (_is_han_redup(w[:-1]) or w[:-1] in _ADV_BEFORE_DI)):
            # jieba keeps adverb+地 as one word (轻轻地/认真地)
            out[i] = (w, r[:-1] + ["de5"])
        elif w == "教":
            # standalone 教 is the verb "teach" (jiao1); noun/religion
            # senses (教室/教育/宗教/请教/...) live in multi-char entries
            out[i] = ("教", ["jiao1"])
        elif w == "只" and prev_w and prev_w[-1] in _MEASURE_DETS:
            out[i] = ("只", ["zhi1"])  # measure word after det/numeral
        elif w == "得" and prev_w in _PRONOUN_WORDS:
            out[i] = ("得", ["dei3"])  # modal "must" after a pronoun
        elif w == "种" and next_w and next_w[0] in "着了过在下上到满好":
            out[i] = ("种", ["zhong4"])  # verb "plant" before aspect/result
    return out


def _tone(s: str) -> str:
    return s[-1] if s and s[-1] in "12345" else ""


def _set_tone(s: str, tone: str) -> str:
    return s[:-1] + tone if _tone(s) else s + tone


def apply_tone_sandhi(
    words: List[Tuple[str, Optional[List[str]]]],
) -> List[Tuple[str, Optional[List[str]]]]:
    """The standard sandhi subset pypinyin's tone_sandhi=True applies.

    - 不: bu4 -> bu2 before a 4th tone (word-internal or next word's
      first syllable).
    - 一: yi1 -> yi2 before 4th tone, yi4 before 1st/2nd/3rd; stays yi1
      when ordinal/final (approximated: only changed when followed by a
      syllable).
    - Third-tone sandhi: within a word, 3 3 -> 2 3 (left-to-right over
      runs: all but the last 3 in a run become 2).
    - Cross-word third tone: adjacent words whose syllables are ALL tone
      3 are pre-merged into one sandhi domain (pypinyin/PaddleSpeech
      ToneSandhi _merge_continuous_three_tones; capped at 3 syllables
      like theirs), so 你/好 -> ni2 hao3 and 我/很/好 -> wo2 hen2 hao3
      across jieba word boundaries (VERDICT r4 #5).
    """
    # pre-merge: runs of adjacent all-tone-3 words become one word, so
    # the word-internal rule below sees the whole run
    def _all_tone3(r: Optional[List[str]]) -> bool:
        return bool(r) and all(_tone(s) == "3" for s in r)

    merged: List[Tuple[str, Optional[List[str]]]] = []
    merged_flag: List[bool] = []
    for word, r in words:
        if (merged and _all_tone3(r)
                and _all_tone3(merged[-1][1])
                and len(merged[-1][1]) + len(r) <= 3):
            pw, pr = merged[-1]
            merged[-1] = (pw + word, pr + list(r))
            merged_flag[-1] = True
        else:
            merged.append((word, list(r) if r is not None else None))
            merged_flag.append(False)
    # second merge rule (PaddleSpeech _merge_continuous_three_tones_2):
    # boundary 3-3 across adjacent words merges them into one domain
    # (很+好听 -> hen2 hao3 ting1) when the combined length stays <= 3,
    # the left word is not a reduplication, and it was not itself
    # produced by a merge (merge_last gate)
    merged2: List[Tuple[str, Optional[List[str]]]] = []
    merged2_flag: List[bool] = []
    for (word, r), was_merged in zip(merged, merged_flag):
        if (merged2 and r is not None and merged2[-1][1]
                and not merged2_flag[-1] and not was_merged
                and _tone(merged2[-1][1][-1]) == "3"
                and _tone(r[0]) == "3"
                and not _is_han_redup(merged2[-1][0])
                and len(merged2[-1][1]) + len(r) <= 3):
            pw, pr = merged2[-1]
            merged2[-1] = (pw + word, pr + list(r))
            merged2_flag[-1] = True
        else:
            merged2.append((word, r))
            merged2_flag.append(was_merged)
    words = merged2
    # flatten view of syllables with (word_idx, syl_idx) back-pointers
    readings = [list(r) if r is not None else None for _, r in words]

    def next_syllable(wi: int, si: int) -> Optional[str]:
        r = readings[wi]
        if r is not None and si + 1 < len(r):
            return r[si + 1]
        for wj in range(wi + 1, len(readings)):
            if readings[wj]:
                return readings[wj][0]
            return None  # unknown char breaks sandhi context
        return None

    for wi, (word, _) in enumerate(words):
        r = readings[wi]
        if r is None:
            continue
        # word-internal third-tone runs: 3 3 (3) -> 2 2 3
        for si in range(len(r) - 1):
            if _tone(r[si]) == "3" and _tone(r[si + 1]) == "3":
                r[si] = _set_tone(r[si], "2")
        for si, ch in enumerate(word):
            if si >= len(r):
                break
            if ch == "不":
                # A-not-A: X不X -> neutral 不 (pypinyin ToneSandhi._bu_),
                # both word-internal (好不好 as one jieba word) and as
                # three single-char segments
                if (len(word) == 3 and si == 1 and word[0] == word[2]):
                    r[si] = _set_tone(r[si], "5")
                    continue
                if (len(word) == 1 and 0 < wi < len(words) - 1
                        and words[wi - 1][0] == words[wi + 1][0]):
                    r[si] = _set_tone(r[si], "5")
                    continue
                nxt = next_syllable(wi, si)
                if nxt and _tone(nxt) == "4":
                    r[si] = _set_tone(r[si], "2")
            elif ch == "一":
                # ordinal/numeral 一 keeps yi1: after 第 or another
                # digit (十一, 第一), or before a date unit (一月/一日/
                # 一号/一年) — pypinyin's ToneSandhi._yi_ carve-outs
                if si > 0:
                    prev_ch = word[si - 1]
                else:
                    prev_ch = words[wi - 1][0][-1] if wi > 0 else ""
                if si + 1 < len(word):
                    next_ch = word[si + 1]
                else:
                    next_ch = (words[wi + 1][0][0]
                               if wi + 1 < len(words) else "")
                if prev_ch in _DIGIT_HANZI or prev_ch == "第" \
                        or next_ch in "月日号":
                    continue
                nxt = next_syllable(wi, si)
                if nxt and _tone(nxt) == "4":
                    r[si] = _set_tone(r[si], "2")
                elif nxt and _tone(nxt) in ("1", "2", "3"):
                    r[si] = _set_tone(r[si], "4")
    return [(w, r) for (w, _), r in zip(words, readings)]


_DEFAULT: Optional[PinyinLexicon] = None


def default_lexicon() -> PinyinLexicon:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = PinyinLexicon()
    return _DEFAULT
