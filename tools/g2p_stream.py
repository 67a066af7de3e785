"""Running-text stream-quality harness for the first-party English G2P.

The held-out PER of tools/g2p_per.py measures the OOV (LTS) path on
isolated words.  But real text is dominated by function words and common
vocabulary that hit the lexicon directly, so the quality number that
matters for inference against espeak-trained checkpoints is over the
TOKEN STREAM of running text (VERDICT r4 #5; reference phonemizes with
espeak, zipvoice/tokenizer/tokenizer.py:32-39).

This tool phonemizes a ~200-sentence prose corpus
(tools/data/en_stream_corpus.txt) through the exact pipeline path
(EnglishG2P.phonemize) and decomposes the emitted phoneme-token stream by
the source of each word:

  lexicon  direct entry        — espeak-grade by construction
  morph    inflection of an entry — one deterministic rule from an entry
  acronym  letter spell-out    — deterministic
  lts      letter-to-sound     — the path held-out PER 0.145 measures

and reports (a) the stream fractions, (b) the expected stream-level
phoneme error = lts_fraction * held-out PER (morph counted at a small
residual rate), i.e. the number to quote against espeak agreement.

Usage:  python tools/g2p_stream.py [--corpus PATH]
"""

import argparse
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from zipvoice_tpu.frontend.en_g2p import (  # noqa: E402
    _WORD_RE,
    word_source,
    word_to_ipa,
)

CORPUS_DEFAULT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data",
    "en_stream_corpus.txt",
)

# measured held-out rates (tools/g2p_per.py, pinned in
# tests/test_g2p_per.py): LTS path segment PER; the morphology path is a
# deterministic rule over a correct base, residual errors are rare
# suffix-voicing/e-restoration cases — bounded here at 2%
LTS_HELDOUT_PER = 0.145
MORPH_RESIDUAL_PER = 0.02


def stream_stats(corpus_path: str = CORPUS_DEFAULT):
    """Returns dict with per-source phoneme-token counts and fractions
    over the corpus token stream, plus expected stream PER."""
    counts = {"lexicon": 0, "morph": 0, "acronym": 0, "lts": 0}
    word_counts = {"lexicon": 0, "morph": 0, "acronym": 0, "lts": 0}
    lts_words = {}
    n_words = 0
    for line in open(corpus_path, encoding="utf-8"):
        line = line.strip()
        if not line:
            continue
        for m in _WORD_RE.finditer(line):
            w = m.group(0)
            spell = w.isupper() and len(w) >= 2
            src = word_source(w, spell_acronym=spell)
            ipa = word_to_ipa(w, spell_acronym=spell)
            n_tok = len(re.sub(r"[ˈˌ]", "", ipa))
            counts[src] += n_tok
            word_counts[src] += 1
            n_words += 1
            if src == "lts":
                lts_words[w.lower()] = ipa
    total = sum(counts.values())
    frac = {k: v / total for k, v in counts.items()}
    expected_per = (frac["lts"] * LTS_HELDOUT_PER
                    + frac["morph"] * MORPH_RESIDUAL_PER)
    return {
        "n_words": n_words,
        "phoneme_tokens": total,
        "token_fractions": frac,
        "word_fractions": {k: v / n_words for k, v in word_counts.items()},
        "expected_stream_per": expected_per,
        "lts_words": lts_words,
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", default=CORPUS_DEFAULT)
    ap.add_argument("--show-lts", action="store_true",
                    help="print every word that took the LTS path")
    args = ap.parse_args()
    s = stream_stats(args.corpus)
    print(f"corpus: {args.corpus}")
    print(f"words: {s['n_words']}  phoneme tokens: {s['phoneme_tokens']}")
    print("token-stream fractions by source:")
    for k in ("lexicon", "morph", "acronym", "lts"):
        print(f"  {k:8s} {s['token_fractions'][k]:7.4f} "
              f"(words {s['word_fractions'][k]:7.4f})")
    print(f"expected stream PER vs espeak-grade reference: "
          f"{s['expected_stream_per']:.4f}")
    if args.show_lts:
        print(f"LTS-path words ({len(s['lts_words'])}):")
        for w, ipa in sorted(s["lts_words"].items()):
            print(f"  {w:20s} {ipa}")


if __name__ == "__main__":
    main()
