"""Shared serving-path parameter packing.

One helper used by BOTH the single-device renderer
(``render/renderer.py``) and the ray-sharded SPMD renderer
(``parallel/render_parallel.py``) so the two serving graphs pre-pack the
same kernel panels once per call instead of re-folding weights inside the
jitted frame (the packed pytrees are tiny — ~2.2 M params total — but the
fold/transpose ops would otherwise run every frame under shard_map).
"""

from __future__ import annotations

import jax.numpy as jnp


def pack_serving_params(params, statics):
    """Return ``params`` augmented with the pre-packed kernel panels the
    serving configuration of ``statics`` will consume.

    - ``nerf_packed`` whenever the fused Pallas NeRF kernel is on;
    - ``sampler_packed`` / ``refine_packed`` when the MinMax nets run as
      fused kernels too (bf16 + no mmnetskips — the fold precondition).

    No-op (returns ``params`` unchanged) outside the Pallas serving path or
    when the panels are already present.
    """
    if not statics.use_pallas or "nerf_packed" in params \
            or "nerf_packed_q" in params:
        return params
    from pronerf_tpu.kernels.fused_minmax import pack_minmax_params
    from pronerf_tpu.kernels.fused_nerf import pack_nerf_params

    pdt = (
        jnp.bfloat16 if statics.compute_dtype == "bfloat16" else jnp.float32
    )
    if statics.quant == "int8":
        from pronerf_tpu.kernels.fused_nerf_q import pack_nerf_params_int8

        params = dict(
            params, nerf_packed_q=pack_nerf_params_int8(params["nerf"])
        )
    else:
        params = dict(
            params, nerf_packed=pack_nerf_params(params["nerf"], pdt)
        )
    if statics.compute_dtype == "bfloat16" and not statics.mmnetskips:
        params["sampler_packed"] = pack_minmax_params(
            params["sampler"], statics.N_point_ray_enc, pdt
        )
        params["refine_packed"] = pack_minmax_params(
            params["refine"], statics.N_samples, pdt
        )
        if statics.transposed:
            from pronerf_tpu.models.pronerf_t import refine_rest_row_perm

            params["refine_packed_t"] = pack_minmax_params(
                params["refine"], statics.N_samples, pdt,
                rest_row_perm=refine_rest_row_perm(
                    statics.num_neighbor, statics.N_samples
                ),
            )
    return params
