"""Pallas TPU kernel for the sampler / refine MinMax MLPs (6x256, ELU,
linear head) on the serving path.

Same design as the transposed fused NeRF kernel (``fused_nerf.py``):
activations are [features, rays] — features on sublanes, rays on lanes —
so the whole 6-layer chain runs with weights and activations VMEM-resident
(the XLA path round-trips ~100 MB of activations per layer through HBM),
and the kernel's operands are layout-neutral with the surrounding graph.

The first layer is pre-FOLDED: the ProNeRF Pluecker ray signature is
constant along a ray (see ``models.mlp.minmax_mlp_apply_folded``), so the
tiled [reps*6 | rest] input contracts to [6 | rest] with row-block-summed
weights. Output is padded to a sublane multiple; callers slice the true
width.

Reference nets: ``run_nerf_helpers.py:1440-1471`` (MinMaxRay_Net), run as
TRT FP16 engines in the reference's accelerated path
(``trt_infer_v2.py:180-246``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 256


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


def pack_minmax_params(params, reps: int, dtype=jnp.bfloat16, c_rep: int = 6,
                       rest_row_perm=None):
    """Transposed kernel panels for a no-skip MinMax net whose first
    ``reps * c_rep`` input rows are an exact tiling.

    Args:
      params: {'layers': [{'w', 'b'} x D], 'out': {'w', 'b'}}.
      reps: tile count of the repeated leading block (48 sampler, 8 refine).
      c_rep: width of the repeated block — 6 (Pluecker [d, m]) for both
        ProNeRF call sites; pass explicitly for any other encoding.
      rest_row_perm: optional permutation of the NON-repeated trailing input
        rows — ``rest_new[i] = rest_old[perm[i]]`` — for callers that feed
        the trailing features in a different row order (the transposed
        serving pipeline feeds epipolar colors as (v, c, s) rows where the
        reference layout is (v, s, c)).
    """
    w0 = jnp.asarray(params["layers"][0]["w"])  # [reps*c_rep + rest, 256]
    assert w0.shape[0] >= reps * c_rep, (
        f"first layer has {w0.shape[0]} input rows < reps*c_rep = "
        f"{reps * c_rep}; wrong reps/c_rep for this net"
    )
    n_out = params["out"]["w"].shape[1]
    w_rep = w0[: reps * c_rep].reshape(reps, c_rep, -1).sum(0)
    w0_rest = w0[reps * c_rep:]
    if rest_row_perm is not None:
        assert len(rest_row_perm) == w0_rest.shape[0]
        w0_rest = w0_rest[jnp.asarray(rest_row_perm)]
    w0_eff = jnp.concatenate([w_rep, w0_rest], axis=0)

    out_pad = _pad8(n_out)
    w_out = jnp.zeros((W, out_pad)).at[:, :n_out].set(
        jnp.asarray(params["out"]["w"])
    )
    b_out = jnp.zeros((out_pad,)).at[:n_out].set(
        jnp.asarray(params["out"]["b"])
    )

    def wt(a):
        return jnp.asarray(a).T.astype(dtype)

    def bias(b):
        return jnp.asarray(b).reshape(-1, 1).astype(dtype)

    packed = {
        "w0_t": wt(w0_eff), "b0": bias(params["layers"][0]["b"]),
        "wout_t": wt(w_out), "bout": bias(b_out),
    }
    for i, layer in enumerate(params["layers"][1:], start=1):
        packed[f"w{i}_t"] = wt(layer["w"])
        packed[f"b{i}"] = bias(layer["b"])
    return packed


def _mm(w_t, x_t):
    return jax.lax.dot_general(
        w_t, x_t.astype(w_t.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w_t.dtype)


def _elu(x):
    # expm1 has no Mosaic lowering; exp(x) - 1 in f32 is within 1 ulp for
    # the x <= 0 branch that actually uses it
    xf = x.astype(jnp.float32)
    return jnp.where(
        xf > 0, xf, jnp.exp(jnp.minimum(xf, 0.0)) - 1.0
    ).astype(x.dtype)


def _make_kernel(depth: int):
    def _kernel(x_ref, *refs):
        ws = refs[:-1]
        out_ref = refs[-1]
        # ws = [w0_t, b0, w1_t, b1, ..., wout_t, bout]
        h = x_ref[:].astype(ws[0].dtype)
        for i in range(depth):
            h = _elu(_mm(ws[2 * i][:], h) + ws[2 * i + 1][:])
        out_ref[:] = (
            _mm(ws[2 * depth][:], h) + ws[2 * depth + 1][:]
        ).astype(jnp.float32)

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("rays_per_block", "interpret", "transpose_out")
)
def fused_minmax_t(
    packed,
    x_t,
    rays_per_block: int = 2048,
    interpret: bool = False,
    transpose_out: bool = True,
):
    """Fused MinMax MLP forward (no AD; inference path).

    Args:
      packed: ``pack_minmax_params`` output.
      x_t: [C, N] transposed input (folded signature, plus any trailing
        per-ray features).
      transpose_out: True returns the row-major [N, out_pad] contract;
        False keeps the kernel-native [out_pad, N] (the transposed serving
        pipeline slices output ROWS, so no relayout is ever paid).

    Returns: [N, out_pad] float32 (linear head); the caller slices its true
    output width (pad columns are exact zero-weight products).
    """
    depth = 1 + max(
        int(k[1:-2]) for k in packed if k.startswith("w") and k[1].isdigit()
    )
    C, N = x_t.shape
    nb = -(-N // rays_per_block)
    padn = nb * rays_per_block - N
    if padn:
        x_t = jnp.pad(x_t, ((0, 0), (0, padn)))
    Np = nb * rays_per_block
    out_pad = packed["wout_t"].shape[0]

    names = []
    for i in range(depth):
        names += [f"w{i}_t", f"b{i}"]
    names += ["wout_t", "bout"]
    ws = [packed[k] for k in names]

    full = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _make_kernel(depth),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((C, rays_per_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ] + [full(w) for w in ws],
        out_specs=pl.BlockSpec((out_pad, rays_per_block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_pad, Np), jnp.float32),
        interpret=interpret,
    )(x_t, *ws)

    return out[:, :N].T if transpose_out else out[:, :N]
