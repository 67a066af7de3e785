"""WER evaluation driver (reference zipvoice/eval/wer/{seedtts,hubert}.py).

Transcribes generated wavs with a local HF ASR model and scores WER against
the reference transcripts.  Model weights must be local (this environment
has no network): pass --asr-model-path pointing at a downloaded
whisper-large-v3 / hubert-large-ls960-ft / paraformer directory.

  python -m zipvoice_tpu.eval.wer_cli \
    --wav-dir results --test-list test.tsv --lang en \
    --asr-model-path /models/whisper-large-v3
"""

import argparse
import logging
import os


def transcribe_batch(model_path: str, wav_paths, lang: str):
    """HF pipeline transcription on host CPU/GPU."""
    import torch
    from transformers import pipeline

    device = 0 if torch.cuda.is_available() else -1
    task = "automatic-speech-recognition"
    asr = pipeline(task, model=model_path, device=device)
    outputs = []
    for p in wav_paths:
        from zipvoice_tpu.frontend.audio import load_wav

        wav = load_wav(p, 16000)[0]
        out = asr({"raw": wav, "sampling_rate": 16000})
        outputs.append(out["text"])
    return outputs


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav-dir", type=str, required=True)
    p.add_argument("--test-list", type=str, required=True,
                   help="tsv: name\\tprompt_text\\tprompt_wav\\ttext")
    p.add_argument("--lang", type=str, default="en", choices=["en", "zh"])
    p.add_argument("--asr-model-path", type=str, required=True)
    p.add_argument("--dialog", action="store_true",
                   help="score cpWER as well ([S1]/[S2] transcripts)")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    from zipvoice_tpu.eval.metrics import corpus_wer, cpwer, wer

    names, refs = [], []
    with open(args.test_list) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            names.append(parts[0])
            refs.append(parts[-1])

    wav_paths = [os.path.join(args.wav_dir, n + ".wav") for n in names]
    missing = [p for p in wav_paths if not os.path.exists(p)]
    assert not missing, f"missing wavs: {missing[:5]}..."

    hyps = transcribe_batch(args.asr_model_path, wav_paths, args.lang)

    overall = corpus_wer(list(zip(refs, hyps)), args.lang)
    lines = [f"overall WER: {overall * 100:.2f}%"]
    for n, r, h in zip(names, refs, hyps):
        d = wer(r, h, args.lang)
        line = f"{n}\t{d['wer'] * 100:.2f}\t{h}"
        if args.dialog:
            line += f"\tcpwer={cpwer(r, h, args.lang) * 100:.2f}"
        lines.append(line)
    report = "\n".join(lines)
    print(report)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report + "\n")


if __name__ == "__main__":
    main()
