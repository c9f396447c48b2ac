"""Checkpoint / weight-loading utilities.

The reference's only persistence surface is MLA decompression-weight loading
from caller buffers (mfa_mla_load_weights, MFABridge.swift:2947-2968); this
module provides the fuller TPU-native equivalent: save/restore arbitrary
param pytrees (orbax when available, npz fallback) including QuantizedTensor
/ QuantizedWeight leaves — so a quantized model round-trips without
re-quantization.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = leaf
    return out, treedef


def save(path: str, tree: Any) -> None:
    """Save a pytree (params, QuantizedTensor/Weight, caches) to `path`.

    Uses orbax-checkpoint when importable, else a .npz + structure JSON.
    """
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), tree, force=True)
        ckptr.wait_until_finished()
        return
    except Exception:
        pass
    flat, _ = _flatten_with_paths(tree)
    arrays = {k: np.asarray(jax.device_get(v)) for k, v in flat.items()}
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)


def restore(path: str, like: Any) -> Any:
    """Restore a pytree saved by `save`, using `like` as the structure/dtype
    template (also returns quantized leaves with correct dtypes)."""
    try:
        import orbax.checkpoint as ocp

        if os.path.isdir(os.path.abspath(path)):
            ckptr = ocp.StandardCheckpointer()
            return ckptr.restore(os.path.abspath(path), like)
    except Exception:
        pass
    npz_path = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz_path)
    flat, treedef = _flatten_with_paths(like)
    leaves = []
    for key, template in flat.items():
        arr = data[key]
        leaves.append(jnp.asarray(arr, getattr(template, "dtype", None)))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), leaves
    )


def load_mla_weights(path_or_arrays, latent_dim: int, out_dim: int):
    """MLA decompression weight loading (reference parity:
    mfa_mla_load_weights — caller supplies W_k / W_v buffers)."""
    if isinstance(path_or_arrays, (tuple, list)):
        w_k, w_v = path_or_arrays
    else:
        data = np.load(path_or_arrays)
        w_k, w_v = data["w_k"], data["w_v"]
    w_k = jnp.asarray(w_k)
    w_v = jnp.asarray(w_v)
    assert w_k.shape == (latent_dim, out_dim), w_k.shape
    assert w_v.shape == (latent_dim, out_dim), w_v.shape
    return w_k, w_v
