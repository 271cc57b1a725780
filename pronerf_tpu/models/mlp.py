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


def _nerf_apply_serving(params, x_pe, d_pe, skips, cdt):
    """bf16 serving forward — same math as ``nerf_mlp_apply`` with two
    graph-level rewrites that cut HBM traffic at frame scale (measured on
    the whole-frame 504x378 graph):

    - skip concatenations become split dots: a layer consuming [x | h]
      runs ``x @ w[:C] + h @ w[C:]`` instead of materializing the [P, C+W]
      concat;
    - a per-ray ``d_pe`` ([N, Cd] against x_pe [N, S, Cx]) drives the view
      branch once per ray and broadcasts over samples — an S-fold saving
      on the direction half of the view matmul and no [P, 256+Cd] concat
      (the reference tiles viewdirs per point, ``run_nerf_helpers.py``
      embedded-dirs path).
    """

    def dot(a, w):
        return jax.lax.dot_general(
            a, w.astype(cdt),
            dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cdt)

    def bias(p):
        return p["b"].astype(cdt)

    x = x_pe.astype(cdt)
    C = x.shape[-1]
    h = x
    for i, layer in enumerate(params["pts"]):
        if i - 1 in skips:
            w = layer["w"]
            h = dot(x, w[:C]) + dot(h, w[C:]) + bias(layer)
        else:
            h = dot(h, layer["w"]) + bias(layer)
        h = jax.nn.relu(h)
    alpha = dot(h, params["alpha"]["w"]) + bias(params["alpha"])
    feature = dot(h, params["feature"]["w"]) + bias(params["feature"])
    wv = params["views"]["w"]
    W_ = feature.shape[-1]
    d = d_pe.astype(cdt)
    hd = dot(d, wv[W_:])
    if d.ndim == x.ndim - 1:
        hd = hd[..., None, :]
    hv = jax.nn.relu(dot(feature, wv[:W_]) + hd + bias(params["views"]))
    rgb = dot(hv, params["rgb"]["w"]) + bias(params["rgb"])
    return jnp.concatenate([rgb, alpha], axis=-1).astype(x_pe.dtype)


def nerf_mlp_apply(params, x_pe, d_pe, skips: Sequence[int] = (4,), compute_dtype=None):
    """Radiance field forward: [..., 63], [..., 27] -> [..., 4] (rgb logits, sigma).

    ``d_pe`` may be per-point ([..., S, Cd], matching x_pe) or — on the
    compute_dtype fast path — per-ray ([..., Cd], one rank lower), in which
    case the view-branch direction term is computed once per ray.
    """
    if compute_dtype is not None:
        return _nerf_apply_serving(params, x_pe, d_pe, skips, compute_dtype)
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


def minmax_mlp_apply_folded(
    params, x_rep, reps: int, x_rest, compute_dtype, skips: Sequence[int] = ()
):
    """Serving-path MinMax forward whose input is ``[tile(x_rep, reps) |
    x_rest]`` WITHOUT materializing the tiling: the first layer's rows for
    the repeated block are pre-summed (``tile(v, k) @ w == v @ sum_k
    w_block`` in exact arithmetic), so the [N, reps*C] input never exists.

    Used because the ProNeRF Pluecker ray signature is constant along a ray
    (m = p x d_hat is invariant under p -> p + t d), making the reference's
    48-point (sampler) / 8-point (refine) encodings exact tilings
    (``run_nerf_helpers.py:613-632`` composed with collinear samples).

    Args:
      x_rep: [N, C] the repeated block (one Pluecker signature per ray).
      reps: tile count (48 sampler, 8 refine).
      x_rest: [N, R] trailing non-repeated features (refine's warped
        colors), or None.
    """
    assert not skips, "folded path supports the release no-skip nets"
    cdt = compute_dtype
    w0 = params["layers"][0]["w"]
    C = x_rep.shape[-1]
    w_rep = w0[: reps * C].reshape(reps, C, -1).sum(0)

    def dot(a, w):
        return jax.lax.dot_general(
            a.astype(cdt), w.astype(cdt),
            dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cdt)

    h = dot(x_rep, w_rep)
    if x_rest is not None:
        h = h + dot(x_rest, w0[reps * C:])
    h = jax.nn.elu(h + params["layers"][0]["b"].astype(cdt))
    for layer in params["layers"][1:]:
        h = jax.nn.elu(dot(h, layer["w"]) + layer["b"].astype(cdt))
    out = dot(h, params["out"]["w"]) + params["out"]["b"].astype(cdt)
    return out.astype(x_rep.dtype)


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
