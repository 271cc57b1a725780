"""The three ProNeRF MLPs as pure functions over plain param pytrees.

Architectures (parity with SURVEY.md §2.5):
- NeRF MLP: D=8, W=256, ReLU, skip re-injecting the encoded position after
  layer 4; separate alpha head, feature head, one 128-wide view branch, rgb
  head (reference ``run_nerf_helpers.py:792-847``). The reference hardcodes
  skips=[4] regardless of the --netskips flag
  (``run_S_eS_eN_alter_base.py:388``) — we default the same.
- MinMaxRay MLP (used for BOTH the sampler and the refine net, different
  in/out widths): D=6, W=256, ELU, linear output; release configs set skips
  to [1000]/[10000], i.e. effectively none
  (reference ``run_nerf_helpers.py:1440-1471``).

Init matches torch.nn.Linear defaults (U(-1/sqrt(fan_in), +1/sqrt(fan_in))
for weights and biases) so training dynamics are comparable.

Matmuls are expressed as [batch, in] @ [in, out] so XLA tiles them straight
onto the MXU; ``compute_dtype=bfloat16`` casts activations+weights for the
inference fast path while keeping f32 master params.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def init_linear(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    bound = 1.0 / (fan_in ** 0.5)
    wkey, bkey = jax.random.split(key)
    return {
        "w": jax.random.uniform(
            wkey, (fan_in, fan_out), dtype, minval=-bound, maxval=bound
        ),
        "b": jax.random.uniform(
            bkey, (fan_out,), dtype, minval=-bound, maxval=bound
        ),
    }


def linear(p, x, compute_dtype=None):
    w, b = p["w"], p["b"]
    if compute_dtype is not None:
        # Fast path (inference): bf16 operands, f32 MXU accumulation.
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        b = b.astype(compute_dtype)
        return (
            jax.lax.dot_general(
                x, w,
                dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(compute_dtype)
            + b
        )
    # Training / parity path: full f32 on the MXU (do not drop to bf16).
    return (
        jax.lax.dot_general(
            x, w,
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        + b
    )


def init_nerf_mlp(
    key,
    D: int = 8,
    W: int = 256,
    input_ch: int = 63,
    input_ch_views: int = 27,
    skips: Sequence[int] = (4,),
    dtype=jnp.float32,
):
    keys = jax.random.split(key, D + 4)
    pts = []
    in_dim = input_ch
    for i in range(D):
        pts.append(init_linear(keys[i], in_dim, W, dtype))
        # Layer i's output is concatenated with the input when i is a skip,
        # so layer i+1 consumes W + input_ch.
        in_dim = W + input_ch if i in skips else W
    return {
        "pts": pts,
        "alpha": init_linear(keys[D], W, 1, dtype),
        "feature": init_linear(keys[D + 1], W, W, dtype),
        "views": init_linear(keys[D + 2], W + input_ch_views, W // 2, dtype),
        "rgb": init_linear(keys[D + 3], W // 2, 3, dtype),
    }


def nerf_mlp_apply(params, x_pe, d_pe, skips: Sequence[int] = (4,), compute_dtype=None):
    """Radiance field forward: [..., 63], [..., 27] -> [..., 4] (rgb logits, sigma)."""
    x_in = x_pe if compute_dtype is None else x_pe.astype(compute_dtype)
    h = x_in
    for i, layer in enumerate(params["pts"]):
        h = jax.nn.relu(linear(layer, h, compute_dtype))
        if i in skips:
            h = jnp.concatenate([x_in, h], axis=-1)
    alpha = linear(params["alpha"], h, compute_dtype)
    feature = linear(params["feature"], h, compute_dtype)
    h = jnp.concatenate(
        [feature, d_pe if compute_dtype is None else d_pe.astype(compute_dtype)],
        axis=-1,
    )
    h = jax.nn.relu(linear(params["views"], h, compute_dtype))
    rgb = linear(params["rgb"], h, compute_dtype)
    out = jnp.concatenate([rgb, alpha], axis=-1)
    return out if compute_dtype is None else out.astype(x_pe.dtype)


def init_minmax_mlp(
    key,
    D: int = 6,
    W: int = 256,
    input_ch: int = 288,
    output_ch: int = 27,
    skips: Sequence[int] = (),
    dtype=jnp.float32,
):
    keys = jax.random.split(key, D + 1)
    layers = []
    in_dim = input_ch
    for i in range(D):
        layers.append(init_linear(keys[i], in_dim, W, dtype))
        in_dim = W + input_ch if i in skips else W
    return {"layers": layers, "out": init_linear(keys[D], W, output_ch, dtype)}


def minmax_mlp_apply(params, x, skips: Sequence[int] = (), compute_dtype=None):
    """Sampler/refine forward: [..., in] -> [..., out] (linear output)."""
    x_in = x if compute_dtype is None else x.astype(compute_dtype)
    h = x_in
    for i, layer in enumerate(params["layers"]):
        h = jax.nn.elu(linear(layer, h, compute_dtype))
        if i in skips:
            h = jnp.concatenate([x_in, h], axis=-1)
    out = linear(params["out"], h, compute_dtype)
    return out if compute_dtype is None else out.astype(x.dtype)


def count_params(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
