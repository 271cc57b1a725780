"""DoNeRF-style single-trunk radiance MLP — the architecture the reference's
accelerated-inference driver instantiates (``run_nerf_helpers.py:1186-1343``:
one D-layer trunk over the encoded position with the encoded view direction
re-injected at a skip layer, final linear layer emitting [rgb, sigma], ReLU
elsewhere, Kaiming-normal init).

Includes the reference's skip-grammar (``"0::63-7:63:"``) parser: entries
``layer::end`` / ``layer:start:end`` name which input-feature range a layer
consumes; ``'auto'`` resolves to injecting the view features at layer
D*7//8. (Note: the reference release is internally inconsistent here — its
stage-2 trainer produces plain-NeRF checkpoints that DoNeRFTRT.load_state_dict
cannot accept; this framework keeps train/infer architectures identical and
offers DoNeRF as an explicit alternative family.)
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from pronerf_tpu.models.mlp import linear


def parse_skip_grammar(skip: str, n_in: int) -> Dict[int, Tuple[int, int]]:
    """``"0::63-7:63:"`` -> {0: (0, 63), 7: (63, n_in)}."""
    locations: Dict[int, Tuple[int, int]] = {}
    if not skip:
        return {0: (0, n_in)}
    for part in skip.split("-"):
        m = re.search(r"^([0-9]+)(:?)([0-9]*)(:?)([0-9]*)$", part)
        if not m:
            raise ValueError(f"bad skip entry {part!r}")
        loc = int(m.group(1))
        has_first, start, has_mid, end = (
            m.group(2), m.group(3), m.group(4), m.group(5)
        )
        if has_first == "" and has_mid == "":
            locations[loc] = (0, n_in)
        elif has_first == ":" and has_mid == "":
            single = int(start + end)
            locations[loc] = (single, single + 1)
        else:
            locations[loc] = (
                int(start) if start else 0,
                int(end) if end else n_in,
            )
    locations.setdefault(0, (0, n_in))
    return locations


def auto_skip(D: int, pos_ch: int = 63, skip_layer: int = 7) -> str:
    return f"0::{pos_ch}-{D * skip_layer // 8}:{pos_ch}:"


def init_donerf(
    key,
    D: int = 8,
    W: int = 256,
    pos_ch: int = 63,
    dir_ch: int = 27,
    n_out: int = 4,
    skip_layer: int = 7,
    dtype=jnp.float32,
):
    """Kaiming-normal weights, zero biases (torch kaiming_normal_ default:
    fan_in mode over the leaky-relu gain sqrt(2))."""
    keys = jax.random.split(key, D)
    layers = []
    in_dim = pos_ch
    skips = {D * skip_layer // 8}
    for i in range(D):
        if i in skips and i != 0:
            in_dim += dir_ch
        out_dim = n_out if i == D - 1 else W
        std = (2.0 / in_dim) ** 0.5
        layers.append(
            {
                "w": std * jax.random.normal(keys[i], (in_dim, out_dim), dtype),
                "b": jnp.zeros((out_dim,), dtype),
            }
        )
        in_dim = out_dim
    return {"layers": layers}


def donerf_apply(params, x_pe, d_pe, skip_layer: int | None = None,
                 compute_dtype=None):
    """[..., pos_ch], [..., dir_ch] -> [..., n_out] (rgb logits, sigma).

    ``skip_layer`` is the view-injection layer; defaults to the 'auto' rule
    D * 7 // 8 used by the reference."""
    D = len(params["layers"])
    skip = D * 7 // 8 if skip_layer is None else skip_layer
    h = x_pe
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        if i == skip and i != 0:
            h = jnp.concatenate([h, d_pe], axis=-1)
        h = linear(layer, h, compute_dtype)
        if i + 1 < n:
            h = jax.nn.relu(h)
    return h if compute_dtype is None else h.astype(x_pe.dtype)
