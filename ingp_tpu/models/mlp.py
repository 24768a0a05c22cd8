"""Small fused-friendly MLPs (replacement for tcnn.Network / nn.Sequential).

The reference's MLPs (networks.py:54-58, 89-163) are tiny (1 hidden layer,
32-128 neurons); on TPU they compile to a pair of MXU matmuls that XLA
fuses with the surrounding elementwise work. Parameters are plain pytrees:
a list of {"w": (in, out), "b": (out,)} layers.

Init matches torch.nn.Linear's default (kaiming-uniform fan_in bound
1/sqrt(in)), which is also what CutlassMLP effectively sees after its
xavier init — metric-level parity is what matters (SURVEY.md §7).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_ACTS = {
    "relu": jax.nn.relu,
    "softplus": jax.nn.softplus,
    "sigmoid": jax.nn.sigmoid,
    "none": lambda x: x,
    "exp": jnp.exp,
}


def mlp_init(key, dims, dtype=jnp.float32):
    """dims: (in, hidden..., out) -> list of layer param dicts."""
    layers = []
    for a, b in zip(dims[:-1], dims[1:]):
        key, kw, kb = jax.random.split(key, 3)
        bound = 1.0 / np.sqrt(a)
        layers.append({
            "w": jax.random.uniform(kw, (a, b), dtype, -bound, bound),
            "b": jax.random.uniform(kb, (b,), dtype, -bound, bound),
        })
    return layers


def mlp_apply(layers, x, hidden_act="relu", out_act="none",
              compute_dtype=jnp.float32):
    """Apply the MLP. Matmuls run in `compute_dtype` (bfloat16 puts them
    on the MXU's fast path); activations/outputs accumulate in fp32."""
    h_act, o_act = _ACTS[hidden_act], _ACTS[out_act]
    h = x.astype(compute_dtype)
    n = len(layers)
    for i, lyr in enumerate(layers):
        h = jnp.dot(h, lyr["w"].astype(compute_dtype),
                    preferred_element_type=jnp.float32) \
            + lyr["b"].astype(jnp.float32)
        h = h_act(h) if i < n - 1 else o_act(h)
        if i < n - 1:
            h = h.astype(compute_dtype)
    return h


def mlp_apply_cm(layers, x, hidden_act="relu", out_act="none",
                 compute_dtype=jnp.float32, x_cm=False):
    """Channel-major MLP: activations are (features, N) with the point
    axis on TPU lanes.

    A (N, out) result with out < 128 (3-wide normals, 7-wide semantics,
    1-wide sigma) pads to (N, 128) in HBM — 18-42x wasted bandwidth.
    Contracting the weight's input axis against the feature axis of the
    activations directly (dot_general, no physical transpose) keeps
    every intermediate and the output dense.

    Args:
      x: (N, in) sample-major by default, or (in, N) when x_cm=True.

    Returns (out, N).
    """
    h_act, o_act = _ACTS[hidden_act], _ACTS[out_act]
    h = x.astype(compute_dtype)
    n = len(layers)
    for i, lyr in enumerate(layers):
        w = lyr["w"].astype(compute_dtype)             # (in, out)
        if i == 0 and not x_cm:
            h = jnp.einsum("fh,nf->hn", w, h,
                           preferred_element_type=jnp.float32)
        else:
            h = jnp.einsum("fh,fn->hn", w, h,
                           preferred_element_type=jnp.float32)
        h = h + lyr["b"].astype(jnp.float32)[:, None]
        h = h_act(h) if i < n - 1 else o_act(h)
        if i < n - 1:
            h = h.astype(compute_dtype)
    return h
