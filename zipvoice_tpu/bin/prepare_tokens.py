"""Tokenize manifest texts offline, caching str tokens into the manifest
(reference zipvoice/bin/prepare_tokens.py).

  python -m zipvoice_tpu.bin.prepare_tokens \
    --manifest data/manifests/custom_cuts_train.jsonl.gz \
    --tokenizer emilia [--lang en-us]
"""

import argparse
import logging


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--manifest", type=str, required=True)
    p.add_argument("--tokenizer", type=str, default="emilia")
    p.add_argument("--lang", type=str, default="en-us")
    args = p.parse_args()

    # host-side prep: never touch the accelerator
    import jax

    jax.config.update("jax_platforms", "cpu")
    logging.basicConfig(level=logging.INFO)

    from zipvoice_tpu.data.manifest import read_manifest, write_manifest
    from zipvoice_tpu.frontend.tokenizer import get_tokenizer

    tokenizer = get_tokenizer(args.tokenizer, None, args.lang)
    cuts = read_manifest(args.manifest)
    texts = [c.text for c in cuts]
    tokens = tokenizer.texts_to_tokens(texts)
    for c, t in zip(cuts, tokens):
        c.tokens = t
    write_manifest(args.manifest, cuts)
    logging.info(f"tokenized {len(cuts)} cuts")


if __name__ == "__main__":
    main()
