"""Checkpoint IO: load reference torch checkpoints / save+load orbax native.

The reference distributes models as ``{model_dir}/model.pt, model.json,
tokens.txt`` (reference zipvoice/bin/infer_zipvoice.py:757-816), optionally
``model.safetensors``.  This module loads those into our flax params via
utils/convert.py, and provides orbax save/load for natively-trained models.
"""

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a torch .pt / .safetensors file to a flat numpy state dict."""
    if path.endswith(".safetensors"):
        try:
            from safetensors.numpy import load_file

            return load_file(path)
        except ImportError:
            from safetensors.torch import load_file as load_tf

            return {k: v.numpy() for k, v in load_tf(path).items()}
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    return {k: v.detach().cpu().numpy() for k, v in ckpt.items()}


def load_model_dir(
    model_dir: str, model_name: str = "zipvoice", dtype=None,
    use_pallas_attention: bool = False,
) -> Tuple[Any, Dict[str, Any], Any]:
    """Load (model, params, tokenizer) from a reference-layout model dir:
    model.pt|model.safetensors + model.json + tokens.txt."""
    import jax.numpy as jnp

    from zipvoice_tpu.frontend.tokenizer import EmiliaTokenizer, DialogTokenizer
    from zipvoice_tpu.models.dialog import ZipVoiceDialog, ZipVoiceDialogStereo
    from zipvoice_tpu.models.zipvoice import ZipVoice, ZipVoiceDistill
    from zipvoice_tpu.utils.convert import convert_zipvoice

    with open(os.path.join(model_dir, "model.json")) as f:
        model_config = json.load(f)["model"]

    token_file = os.path.join(model_dir, "tokens.txt")
    extra = {}
    if model_name in ("zipvoice_dialog", "zipvoice_dialog_stereo"):
        tokenizer = DialogTokenizer(token_file)
        extra = dict(
            spk_a_id=tokenizer.spk_a_id, spk_b_id=tokenizer.spk_b_id
        )
    else:
        tokenizer = EmiliaTokenizer(token_file)

    cls = {
        "zipvoice": ZipVoice,
        "zipvoice_distill": ZipVoiceDistill,
        "zipvoice_dialog": ZipVoiceDialog,
        "zipvoice_dialog_stereo": ZipVoiceDialogStereo,
    }[model_name]
    model = cls(
        **model_config,
        vocab_size=tokenizer.vocab_size,
        pad_id=tokenizer.pad_id,
        dtype=dtype or jnp.float32,
        use_pallas_attention=use_pallas_attention,
        **extra,
    )

    ckpt_path = os.path.join(model_dir, "model.pt")
    if not os.path.exists(ckpt_path):
        ckpt_path = os.path.join(model_dir, "model.safetensors")
    state_dict = load_torch_state_dict(ckpt_path)
    params = {"params": convert_zipvoice(state_dict)}
    return model, params, tokenizer


def load_vocos(path: Optional[str], dtype=None):
    """Vocos vocoder: converted torch weights if ``path`` given, else random
    init (no network access to fetch charactr/vocos-mel-24khz here)."""
    import jax
    import jax.numpy as jnp

    from zipvoice_tpu.vocoder.vocos import Vocos, convert_vocos_state_dict

    vocoder = Vocos(dtype=dtype or jnp.float32)
    if path:
        sd = load_torch_state_dict(path)
        params = {"params": convert_vocos_state_dict(sd)}
    else:
        params = vocoder.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, vocoder.n_mels))
        )
    return vocoder, params


# --- orbax native checkpoints ------------------------------------------------


def save_checkpoint(path: str, state, extra: Optional[dict] = None) -> None:
    """Save a TrainState (or any pytree) with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    if extra is not None:
        with open(os.path.join(path, "extra.json"), "w") as f:
            json.dump(extra, f)


def load_checkpoint(path: str, target=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(path, target)
    extra_path = os.path.join(path, "extra.json")
    extra = None
    if os.path.exists(extra_path):
        with open(extra_path) as f:
            extra = json.load(f)
    return state, extra
