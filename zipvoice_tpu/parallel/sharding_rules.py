"""Tensor-parallel partition rules for the ZipVoice parameter tree.

The 123M model fits one chip, so data parallelism is the default (matching
the reference's DDP-only story, SURVEY.md §2.10); the mesh's ``model`` axis
becomes useful for larger variants (e.g. Dialog-Stereo's two-stream decoder)
or very long sequences.  These rules shard the big matmuls Megatron-style
and let GSPMD insert the collectives:

- feedforward: in_proj column-parallel (hidden sharded), out_proj
  row-parallel (hidden sharded) — one psum per FF;
- attention projections: in_proj column-parallel over the fused
  (q|k|p)·heads output dim, value in_proj column-parallel, out_proj
  row-parallel;
- everything else (norms, biases of row-parallel layers, embeddings,
  convs) replicated.

Biases of column-parallel layers shard with their outputs; biases of
row-parallel layers stay replicated (added after the reduction).
"""

import re
from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, PartitionSpec for the kernel, spec for the bias)
_RULES = [
    # feedforward: Dense kernels are (in, out)
    (r".*feed_forward\d/in_proj/kernel", P(None, "model")),
    (r".*feed_forward\d/in_proj/bias", P("model")),
    (r".*feed_forward\d/out_proj/kernel", P("model", None)),
    # attention fused qkp projection: column-parallel over heads
    (r".*self_attn_weights/in_proj/kernel", P(None, "model")),
    (r".*self_attn_weights/in_proj/bias", P("model")),
    (r".*self_attn_weights/linear_pos/kernel", P(None, "model")),
    # value projection / output projection
    (r".*self_attn\d/in_proj/kernel", P(None, "model")),
    (r".*self_attn\d/in_proj/bias", P("model")),
    (r".*self_attn\d/out_proj/kernel", P("model", None)),
    # nonlin attention: hidden*3 columns
    (r".*nonlin_attention/in_proj/kernel", P(None, "model")),
    (r".*nonlin_attention/in_proj/bias", P("model")),
    (r".*nonlin_attention/out_proj/kernel", P("model", None)),
]


def param_spec(path: str) -> P:
    for pattern, spec in _RULES:
        if re.fullmatch(pattern, path):
            return spec
    return P()  # replicated


def _paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def make_param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings following the TP rules.

    Degenerate cases (model axis size 1, or a dim not divisible by the axis
    size) fall back to replication so the same code path serves pure DP.
    """
    model_size = mesh.shape.get("model", 1)

    def spec_for(path_tuple, leaf):
        path = "/".join(path_tuple)
        spec = param_spec(path)
        if model_size == 1:
            return NamedSharding(mesh, P())
        # verify divisibility; else replicate
        for dim, axis in zip(leaf.shape, spec):
            if axis == "model" and dim % model_size != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    flat = dict(_paths(params))
    out = {}
    for path, leaf in flat.items():
        out[path] = spec_for(path, leaf)
    # rebuild tree
    tree: Dict = {}
    for path, sh in out.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = sh
    return tree


def shard_params(params, mesh: Mesh):
    shardings = make_param_shardings(params, mesh)
    return jax.tree.map(
        lambda p, s: jax.device_put(p, s), params, shardings
    )
