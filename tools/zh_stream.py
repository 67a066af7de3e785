"""Running-text stream-quality harness for the first-party Chinese G2P.

The polyphone suite (tests/test_zh_polyphone.py) scores isolated
contextual sentences built around known polyphones.  This harness scores
the full greedy-segmentation pipeline over a prose corpus with
hand-annotated gold tone3 readings (tools/data/zh_stream_corpus.tsv),
measuring what VERDICT r4 called unmeasured: missegmentation of running
text by greedy longest-match over the word table (the jieba role,
reference zipvoice/tokenizer/tokenizer.py:324-367).

Metrics over the per-character syllable stream:
  base  — syllable without the tone digit (segmentation + polyphone
          base-reading quality; tone sandhi cannot affect it)
  full  — syllable with tone, gold including sandhi and neutral-5
  poly  — base accuracy restricted to characters with >1 attested
          reading in the engine's own tables (the at-risk set)

Usage:  python tools/zh_stream.py [--corpus PATH] [--show-errors]
"""

import argparse
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from zipvoice_tpu.frontend.zh_g2p import default_lexicon  # noqa: E402

CORPUS_DEFAULT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data",
    "zh_stream_corpus.tsv",
)


def _is_han(ch: str) -> bool:
    return "一" <= ch <= "鿿"


def _base(syl: str) -> str:
    return syl[:-1] if syl and syl[-1] in "12345" else syl


def polyphone_chars(lex) -> set:
    """Characters with more than one attested base reading across the
    engine's own tables (single-char entry vs any multi-char word
    containing them)."""
    readings = {}
    for word, sylls in lex.table.items():
        for ch, syl in zip(word, sylls):
            if _is_han(ch):
                readings.setdefault(ch, set()).add(_base(syl))
    return {ch for ch, bases in readings.items() if len(bases) > 1}


def score(corpus_path: str = CORPUS_DEFAULT, show_errors: bool = False,
          use_jieba: bool = False):
    """use_jieba=True scores the REAL tokenizer path when jieba is
    installed (tokenizer.tokenize_ZH: jieba.cut -> g2p_words); False
    scores the self-contained greedy-segmentation fallback."""
    lex = default_lexicon()
    if use_jieba:
        import jieba  # noqa: F401
    poly = polyphone_chars(lex)
    n = base_ok = full_ok = 0
    n_poly = poly_ok = 0
    errors = []
    n_lines = bad_lines = 0
    with open(corpus_path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            text, gold_s = line.split("\t")
            hanzi = "".join(ch for ch in text if _is_han(ch))
            gold = gold_s.split()
            # feed the PUNCTUATED text: punctuation breaks sandhi
            # domains exactly as in the real tokenizer path, then keep
            # the han-position outputs (g2p emits 1 item per char)
            if use_jieba:
                import jieba
                full = lex.g2p_words(list(jieba.cut(text)))
                # g2p_words emits one syllable per han char and passes
                # non-han words through verbatim; flatten multi-char
                # non-han words to per-char items for alignment
                flat = []
                for item in full:
                    if (item[:-1].isalpha() and item[-1:] in "12345") \
                            or len(item) == 1:
                        flat.append(item)
                    else:
                        flat.extend(item)
                full = flat
            else:
                full = lex.g2p(text)
            n_lines += 1
            hyp = ([s for ch, s in zip(text, full) if _is_han(ch)]
                   if len(full) == len(text) else full)
            if len(hyp) != len(hanzi) or len(gold) != len(hanzi):
                bad_lines += 1
                errors.append((text, "LENGTH", gold, hyp))
                continue
            for ch, g, h in zip(hanzi, gold, hyp):
                n += 1
                b_ok = _base(g) == _base(h)
                base_ok += b_ok
                full_ok += g == h
                if ch in poly:
                    n_poly += 1
                    poly_ok += b_ok
                if g != h:
                    errors.append((text, ch, g, h))
    stats = {
        "lines": n_lines,
        "bad_lines": bad_lines,
        "chars": n,
        "base_acc": base_ok / max(n, 1),
        "full_acc": full_ok / max(n, 1),
        "poly_chars": n_poly,
        "poly_frac": n_poly / max(n, 1),
        "poly_base_acc": poly_ok / max(n_poly, 1),
    }
    return stats, errors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=CORPUS_DEFAULT)
    ap.add_argument("--show-errors", action="store_true")
    ap.add_argument("--jieba", action="store_true",
                    help="score the jieba.cut + g2p_words path")
    args = ap.parse_args()
    stats, errors = score(args.corpus, use_jieba=args.jieba)
    for k, v in stats.items():
        print(f"{k:>15}: {v:.4f}" if isinstance(v, float) else
              f"{k:>15}: {v}")
    if args.show_errors:
        for text, ch, g, h in errors:
            print(f"  [{ch}] gold={g} hyp={h}   {text}")


if __name__ == "__main__":
    main()
