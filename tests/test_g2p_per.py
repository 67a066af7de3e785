"""Held-out G2P accuracy metrics (VERDICT round-3 Next #1).

The reference's English G2P is espeak-ng via piper-phonemize (reference
zipvoice/tokenizer/tokenizer.py:32-39,160).  Ours is lexicon + morphology +
LTS (frontend/en_g2p.py); these tests pin its measured generalization so a
rule regression fails CI rather than silently degrading token streams.

Methodology (tools/g2p_per.py): every lexicon entry is re-predicted with
its own entry hidden — the exact path an out-of-vocabulary word takes —
and scored as segment-level PER against the entry.
"""

import os
import sys

import conftest  # noqa: F401

sys.path.insert(0, os.path.join(conftest.REPO_ROOT, "tools"))


def test_held_out_per_pinned():
    from g2p_per import score

    r = score()
    # measured at round 4: PER 0.146, exact 0.507, stress 0.939 over the
    # 3.7k-entry lexicon; thresholds leave margin for lexicon growth
    # (bigger lexicons skew toward harder words) but catch real
    # regressions
    assert r["n_words"] >= 3500, r["n_words"]
    assert r["per"] < 0.18, r["per"]
    assert r["word_exact"] > 0.45, r["word_exact"]
    assert r["stress_acc_on_exact"] > 0.90, r["stress_acc_on_exact"]


def test_per_tool_segmentation_roundtrip():
    """Every lexicon pronunciation segments losslessly (no unknown
    codepoints counted as error fodder)."""
    from g2p_per import segment_ipa

    from zipvoice_tpu.frontend.en_g2p import VOWELS, _lexicon

    known = VOWELS | set("pbtdkɡfvθðszʃʒhmnŋlɹjwɾʔɔ") | {"tʃ", "dʒ"}
    for w, ipa in _lexicon().items():
        segs, _ = segment_ipa(ipa)
        for s in segs:
            assert s in known, (w, ipa, s)


def test_morphology_and_rules_spot_checks():
    """Systematic paths exercised by the round-4 rules."""
    from zipvoice_tpu.frontend.en_g2p import word_to_ipa

    cases = {
        # inflection voicing + magic-e through -s/-d
        "makes": "mˈeɪks",
        "jones": "dʒˈoʊnz",
        # -ed devoices after voiceless sibilants (ADVICE r4); espeak says
        # jˈuːzd for "used" (verb /z/) — that form comes from the lexicon
        # entry, this pin is the morphology path over base "use" /s/
        "used": "jˈuːst",
        "missed": "mˈɪst",
        "wished": "wˈɪʃt",
        # suffix peeling with open/closed syllable stems
        "nation": "nˈeɪʃən",
        "social": "sˈoʊʃəl",
        "mission": "mˈɪʃən",
        # silent letters
        "tongue": "tˈʌŋ",
        "technique": "tɛknˈiːk",
        "unique": "ʌnˈiːk",  # espeak juːnˈiːk; final-stress -ique captured
        "calm": "kˈɑːm",
        "folk": "fˈoʊk",
    }
    for w, want in cases.items():
        assert word_to_ipa(w, _no_direct_lookup=True) == want, (
            w, word_to_ipa(w, _no_direct_lookup=True), want
        )


def test_running_text_stream_metrics_pinned():
    """Stream-level quality over running prose (VERDICT r4 #5): function
    words dominate real text, so the token-stream decomposition — not
    isolated-word exact-match — is the number that predicts agreement
    with espeak-trained checkpoints.  Pins the 200-sentence corpus
    (tools/data/en_stream_corpus.txt) fractions with margin."""
    from g2p_stream import stream_stats

    s = stream_stats()
    assert s["n_words"] >= 2000, s["n_words"]
    # >= 75% of emitted phoneme tokens come straight from lexicon entries
    assert s["token_fractions"]["lexicon"] > 0.75, s["token_fractions"]
    # <= 10% of the stream rides the LTS path the held-out PER measures
    assert s["token_fractions"]["lts"] < 0.10, s["token_fractions"]
    # expected stream-level phoneme error vs espeak-grade reference
    assert s["expected_stream_per"] < 0.02, s["expected_stream_per"]
