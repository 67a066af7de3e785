"""Structural checkpoint transforms for fine-tuning initialization.

Reference zipvoice/utils/checkpoint.py:147-229:
- ``extend_vocab``: initialize a Dialog model from a base ZipVoice
  checkpoint — the embedding table grows by ``extend_size`` rows (the +28
  dialog tokens) keeping the original rows, and spk_embed starts fresh.
- ``copy_proj_three_channel``: initialize the Stereo model's two-stream
  fm_decoder projections from the mono Dialog decoder: the stream-0 input
  projection splits the mono weights across the doubled channels
  ([xt/2, xt/2, text, cond/2, cond/2]) and the stream-0 output projection
  duplicates rows; stream-1 keeps the originals.

These operate on OUR flax param trees (numpy leaves).
"""

from typing import Dict

import numpy as np


def extend_vocab(params: Dict, new_vocab_size: int, rng=None,
                 feat_dim: int = 100) -> Dict:
    """Grow embed.embedding to new_vocab_size rows; add fresh spk_embed."""
    emb = params["embed"]["embedding"]
    old_v, d = emb.shape
    assert new_vocab_size >= old_v, (new_vocab_size, old_v)
    rng = rng or np.random.RandomState(0)
    new_emb = rng.normal(0, 1.0, (new_vocab_size, d)).astype(np.float32)
    new_emb[:old_v] = emb
    out = dict(params)
    out["embed"] = {"embedding": new_emb}
    if "spk_embed" not in out:
        out["spk_embed"] = {
            "embedding": rng.normal(0, 0.1, (2, feat_dim)).astype(np.float32)
        }
    return out


def copy_proj_three_channel(params: Dict, feat_dim: int) -> Dict:
    """Mono dialog decoder -> two-stream stereo decoder projections.

    Our layout: fm_decoder/in_proj{kernel (3F,D), bias} becomes
    in_proj_0 {kernel (5F,D)} + in_proj_1 {= original}; likewise out_proj
    (D,F) -> out_proj_0 (D,2F) + out_proj_1.  (Note flax kernels are
    (in, out) = the transpose of the torch weights the reference splits,
    checkpoint.py:198-228.)
    """
    F = feat_dim
    out = dict(params)
    fm = dict(out["fm_decoder"])
    ip = fm.pop("in_proj")
    k, b = ip["kernel"], ip["bias"]  # k: (3F, D)
    k0 = np.concatenate(
        [k[:F] / 2, k[:F] / 2, k[F : 2 * F], k[2 * F :] / 2, k[2 * F :] / 2],
        axis=0,
    )  # (5F, D)
    fm["in_proj_0"] = {"kernel": k0, "bias": b}
    fm["in_proj_1"] = {"kernel": k, "bias": b}
    op = fm.pop("out_proj")
    k, b = op["kernel"], op["bias"]  # k: (D, F), b: (F,)
    fm["out_proj_0"] = {
        "kernel": np.concatenate([k, k], axis=1),
        "bias": np.concatenate([b, b], axis=0),
    }
    fm["out_proj_1"] = {"kernel": k, "bias": b}
    out["fm_decoder"] = fm
    return out


def graft_missing(dst: Dict, src: Dict) -> Dict:
    """Recursively add entries of ``src`` absent from ``dst`` (in place).

    Used for two-stream from-scratch init: @nn.compact creates only the
    projection pair the init input exercises, so the trainer inits the model
    at both input widths with the same rng (trunk params are path-keyed and
    identical) and grafts the second pair in.  The reference creates both
    pairs structurally (zipvoice_dialog.py:241-256,
    zipformer_two_stream.py:161-167).
    """
    for k, v in src.items():
        if k not in dst:
            dst[k] = v
        elif isinstance(v, dict):
            graft_missing(dst[k], v)
    return dst
