"""Convert reference PyTorch ZipVoice checkpoints to zipvoice_tpu param pytrees.

The reference publishes checkpoints as torch ``state_dict``s (model.pt /
model.safetensors, see reference zipvoice/bin/infer_zipvoice.py:771-816).
This module maps those flat dotted keys onto our flax parameter tree.

Layout conventions translated here:
- torch nn.Linear weight (out, in)  ->  flax Dense kernel (in, out)
- torch depthwise Conv1d weight (C, 1, k) -> our (k, C) "depthwise_weight"
- torch nn.Embedding weight (V, D) -> flax nn.Embed "embedding" (V, D)
- module-name changes documented in models/zipformer.py (e.g. the reference's
  ``time_embed.0/2`` Sequential becomes ``time_embed_in/out``; a
  non-downsampled encoder gains an explicit ``encoder`` scope so all stacks
  share one code path).

Works on numpy arrays; accepts torch tensors (detached via .numpy()).
"""

import re
from typing import Dict, Any

import numpy as np


def _to_numpy(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _set_path(tree: Dict[str, Any], path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def translate_zipformer_key(key: str):
    """Translate one reference TTSZipformer state_dict key.

    Returns (path_tuple, transform) where transform in {None, 'T', 'dw'}.
    Returns None for keys with no parameter in our tree (e.g. buffers).
    """
    k = key
    k = k.replace("time_embed.0.", "time_embed_in.")
    k = k.replace("time_embed.2.", "time_embed_out.")
    k = re.sub(r"encoders\.(\d+)\.", r"encoders_\1.", k)
    k = re.sub(r"layers\.(\d+)\.", r"layers_\1.", k)
    k = k.replace("time_emb.1.", "time_emb_proj.")
    # two-stream projection ModuleLists (zipformer_two_stream.py:161-167)
    k = re.sub(r"\b(in_proj|out_proj)\.([01])\.", r"\1_\2.", k)

    m = re.match(r"(encoders_\d+)\.(.*)", k)
    if m:
        stack, rest = m.groups()
        if rest == "downsample.bias":
            return (stack, "downsample_bias"), None
        if rest.startswith("out_combiner."):
            k = f"{stack}.{rest}"
        elif rest.startswith("encoder."):
            k = f"{stack}.{rest}"
        else:
            k = f"{stack}.encoder.{rest}"

    if k.endswith("depthwise_conv.weight"):
        k = k.replace("depthwise_conv.weight", "depthwise_weight")
        return tuple(k.split(".")), "dw"
    if k.endswith("depthwise_conv.bias"):
        k = k.replace("depthwise_conv.bias", "depthwise_bias")
        return tuple(k.split(".")), None

    if k.endswith(".weight"):
        # Linear weights -> transposed Dense kernels. (BiasNorm has no
        # .weight; embeddings are handled by the model-level converter.)
        k = k[: -len(".weight")] + ".kernel"
        return tuple(k.split(".")), "T"

    return tuple(k.split(".")), None


def convert_tts_zipformer(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a reference TTSZipformer state_dict to a flax params dict
    (the contents of variables['params'])."""
    tree: Dict[str, Any] = {}
    for key, value in state_dict.items():
        out = translate_zipformer_key(key)
        if out is None:
            continue
        path, transform = out
        v = _to_numpy(value).astype(np.float32)
        if transform == "T":
            v = v.T
        elif transform == "dw":
            v = v[:, 0, :].T  # (C, 1, k) -> (k, C)
        _set_path(tree, path, v)
    return tree


def _flatten(tree: Dict[str, Any], prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def invert_zipformer_tree(tree: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Flax TTSZipformer params -> reference torch state_dict keys (the
    inverse of convert_tts_zipformer; used to export trained models in the
    reference's .pt layout)."""
    out: Dict[str, Any] = {}
    for path, v in _flatten(tree):
        k = ".".join(path)
        v = np.asarray(v, dtype=np.float32)
        # undo structural renames (reverse order of translate_zipformer_key)
        k = k.replace(".time_emb_proj.", ".time_emb.1.")
        k = re.sub(r"\b(in_proj|out_proj)_([01])\.", r"\1.\2.", k)
        if k.endswith(".downsample_bias"):
            k = k.replace(".downsample_bias", ".downsample.bias")
        m = re.match(r"encoders_(\d+)\.(.*)", k)
        if m:
            idx, rest = m.groups()
            if rest.startswith("encoder.") and ".downsample" not in k:
                # non-downsampled stacks have no .encoder scope in torch —
                # but we cannot know ds here; keep .encoder and fix below
                pass
            k = f"encoders.{idx}.{rest}"
        k = re.sub(r"\blayers_(\d+)\.", r"layers.\1.", k)
        k = k.replace("time_embed_in.", "time_embed.0.")
        k = k.replace("time_embed_out.", "time_embed.2.")
        if k.endswith("depthwise_weight"):
            k = k.replace("depthwise_weight", "depthwise_conv.weight")
            v = v.T[:, None, :]  # (k, C) -> (C, 1, k)
        elif k.endswith("depthwise_bias"):
            k = k.replace("depthwise_bias", "depthwise_conv.bias")
        elif k.endswith(".kernel"):
            k = k[: -len(".kernel")] + ".weight"
            v = v.T
        out[prefix + k] = v
    return out


def invert_zipvoice(params: Dict[str, Any], downsampling_factors=None
                    ) -> Dict[str, Any]:
    """Full model flax params -> reference torch state_dict (numpy values).

    ``downsampling_factors``: dict like {"fm_decoder": (1,2,4,2,1),
    "text_encoder": (1,)} used to drop the ``.encoder`` scope for
    non-downsampled stacks (the reference nests it only when ds>1).
    """
    out: Dict[str, Any] = {}
    for name in ("fm_decoder", "text_encoder"):
        if name not in params:
            continue
        sub = invert_zipformer_tree(params[name], prefix=name + ".")
        ds = (downsampling_factors or {}).get(name)
        fixed = {}
        for k, v in sub.items():
            if ds is not None:
                m = re.match(rf"{name}\.encoders\.(\d+)\.encoder\.(.*)", k)
                if m and ds[int(m.group(1))] == 1:
                    k = f"{name}.encoders.{m.group(1)}.{m.group(2)}"
            fixed[k] = v
        out.update(fixed)
    if "embed" in params:
        out["embed.weight"] = np.asarray(
            params["embed"]["embedding"], np.float32
        )
    if "spk_embed" in params:
        out["spk_embed.weight"] = np.asarray(
            params["spk_embed"]["embedding"], np.float32
        )
    return out


def convert_zipvoice(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a full reference ZipVoice/ZipVoiceDistill/ZipVoiceDialog
    state_dict (reference zipvoice/models/zipvoice.py:95-133) to flax params."""
    fm, text, rest = {}, {}, {}
    for key, value in state_dict.items():
        if key.startswith("fm_decoder."):
            fm[key[len("fm_decoder."):]] = value
        elif key.startswith("text_encoder."):
            text[key[len("text_encoder."):]] = value
        else:
            rest[key] = value

    tree: Dict[str, Any] = {
        "fm_decoder": convert_tts_zipformer(fm),
        "text_encoder": convert_tts_zipformer(text),
    }
    for key, value in rest.items():
        v = _to_numpy(value).astype(np.float32)
        if key == "embed.weight":
            _set_path(tree, ("embed", "embedding"), v)
        elif key == "spk_embed.weight":  # dialog models
            _set_path(tree, ("spk_embed", "embedding"), v)
        else:
            out = translate_zipformer_key(key)
            if out is None:
                continue
            path, transform = out
            if transform == "T":
                v = v.T
            _set_path(tree, path, v)
    return tree
