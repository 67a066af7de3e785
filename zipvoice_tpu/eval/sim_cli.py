"""Speaker-similarity (SIM-o) evaluation driver.

Reference zipvoice/eval/speaker_similarity/sim.py: cosine similarity of
speaker embeddings between generated wavs and their prompts, using a
WavLM-large + ECAPA-TDNN speaker verification model.

Pass --spk-model-path with a local HF speaker-verification model directory
(e.g. microsoft/wavlm-base-plus-sv, or the UniSpeech-SAT sv models) — this
environment has no network to fetch them.

  python -m zipvoice_tpu.eval.sim_cli \
    --wav-dir results --test-list test.tsv \
    --spk-model-path /models/wavlm-base-plus-sv
"""

import argparse
import logging
import os

import numpy as np


def embed_batch(model_path: str, wav_paths):
    import torch
    from transformers import AutoFeatureExtractor, AutoModel

    try:
        from transformers import AutoModelForAudioXVector

        model = AutoModelForAudioXVector.from_pretrained(model_path)
        use_xvector = True
    except Exception:
        model = AutoModel.from_pretrained(model_path)
        use_xvector = False
    fe = AutoFeatureExtractor.from_pretrained(model_path)
    model.eval()

    from zipvoice_tpu.frontend.audio import load_wav

    embs = []
    with torch.no_grad():
        for p in wav_paths:
            wav = load_wav(p, 16000)[0]
            inputs = fe(wav, sampling_rate=16000, return_tensors="pt")
            out = model(**inputs)
            if use_xvector:
                emb = out.embeddings[0]
            else:
                emb = out.last_hidden_state.mean(dim=1)[0]
            embs.append(emb.numpy())
    return embs


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav-dir", type=str, required=True)
    p.add_argument("--test-list", type=str, required=True,
                   help="tsv: name\\tprompt_text\\tprompt_wav\\ttext")
    p.add_argument("--spk-model-path", type=str, required=True)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    from zipvoice_tpu.eval.metrics import cosine_similarity

    names, prompts = [], []
    with open(args.test_list) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            names.append(parts[0])
            prompts.append(parts[2])

    gen_paths = [os.path.join(args.wav_dir, n + ".wav") for n in names]
    gen_embs = embed_batch(args.spk_model_path, gen_paths)
    prompt_embs = embed_batch(args.spk_model_path, prompts)

    sims = [
        cosine_similarity(g, p) for g, p in zip(gen_embs, prompt_embs)
    ]
    report = [f"overall SIM: {np.mean(sims):.4f}"]
    report += [f"{n}\t{s:.4f}" for n, s in zip(names, sims)]
    print("\n".join(report))
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(report) + "\n")


if __name__ == "__main__":
    main()
