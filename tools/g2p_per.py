"""Held-out phoneme-error-rate (PER) harness for the first-party English G2P.

The reference phonemizes with espeak-ng (reference
zipvoice/tokenizer/tokenizer.py:32-39,160); our replacement
(frontend/en_g2p.py) is lexicon + morphology + LTS rules.  This tool
quantifies how well the morphology+LTS path generalizes: every lexicon
entry is predicted with its OWN entry disabled (other entries stay visible
to morphology — exactly the path a real out-of-vocabulary word takes),
and the prediction is scored against the entry as segment-level PER.

    PER = sum(levenshtein(ref_segments, hyp_segments)) / sum(len(ref_segments))

computed stress-blind, plus a separate primary-stress placement accuracy
over words where the segments matched exactly.

Usage:
    python tools/g2p_per.py [--sample N] [--seed K] [--verbose-worst M]

With --sample N, a deterministic random subset of N entries is scored
(the tests pin the full-lexicon number; sampling is for quick iteration).
"""

import argparse
import os
import random
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from zipvoice_tpu.frontend.en_g2p import (  # noqa: E402
    VOWELS,
    _lexicon,
    word_to_ipa,
)

# Every segment the engine or lexicon can emit, longest-first for maximal
# munch.  Affricates and long vowels must win over their prefixes.
_CONS = set("pbtdkɡfvθðszʃʒhmnŋlɹjwɾʔ") | {"tʃ", "dʒ"}
# espeak en-us writes a bare ɔ before ŋ (long -> lˈɔŋ)
_SEGMENTS = sorted(VOWELS | _CONS | {"ɔ"}, key=len, reverse=True)
_STRESS = {"ˈ", "ˌ"}


def segment_ipa(ipa: str):
    """Maximal-munch an IPA string into (segments, primary_stress_nucleus).

    Returns the stress-stripped segment list and the index (into the
    nucleus subsequence) of the primary-stressed vowel, or None.
    """
    segs = []
    stress_next = False
    stressed_nucleus = None
    nucleus_count = 0
    i = 0
    while i < len(ipa):
        c = ipa[i]
        if c in _STRESS:
            stress_next = c == "ˈ"
            i += 1
            continue
        if c == " ":
            i += 1
            continue
        for s in _SEGMENTS:
            if ipa.startswith(s, i):
                segs.append(s)
                if s in VOWELS or s == "ɔ":
                    if stress_next and stressed_nucleus is None:
                        stressed_nucleus = nucleus_count
                    nucleus_count += 1
                    stress_next = False
                i += len(s)
                break
        else:
            # unknown codepoint: keep as its own segment so it counts as
            # an error rather than silently vanishing
            segs.append(c)
            i += 1
    return segs, stressed_nucleus


def edit_distance(a, b) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


def score(sample=None, seed=0):
    lex = _lexicon()
    words = sorted(lex)
    if sample:
        words = random.Random(seed).sample(words, min(sample, len(words)))
    total_ref = 0
    total_err = 0
    exact = 0
    stress_eval = 0
    stress_ok = 0
    rows = []
    for w in words:
        ref_segs, ref_stress = segment_ipa(lex[w])
        hyp = word_to_ipa(w, _no_direct_lookup=True)
        hyp_segs, hyp_stress = segment_ipa(hyp)
        d = edit_distance(ref_segs, hyp_segs)
        total_ref += len(ref_segs)
        total_err += d
        if d == 0:
            exact += 1
            if ref_stress is not None:
                stress_eval += 1
                stress_ok += ref_stress == hyp_stress
        rows.append((d / max(len(ref_segs), 1), d, w, lex[w], hyp))
    return {
        "n_words": len(words),
        "per": total_err / max(total_ref, 1),
        "word_exact": exact / max(len(words), 1),
        "stress_acc_on_exact": stress_ok / max(stress_eval, 1),
        "stress_eval_n": stress_eval,
        "rows": rows,
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sample", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--verbose-worst", type=int, default=0)
    args = ap.parse_args()
    r = score(args.sample, args.seed)
    print(f"words scored:            {r['n_words']}")
    print(f"segment PER:             {r['per']:.3f}")
    print(f"word exact-match:        {r['word_exact']:.3f}")
    print(f"stress acc (exact only): {r['stress_acc_on_exact']:.3f} "
          f"(n={r['stress_eval_n']})")
    if args.verbose_worst:
        worst = sorted(r["rows"], reverse=True)[: args.verbose_worst]
        for frac, d, w, ref, hyp in worst:
            print(f"  {w:20s} ref={ref:28s} hyp={hyp:28s} d={d}")


if __name__ == "__main__":
    main()
