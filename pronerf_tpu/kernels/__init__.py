from pronerf_tpu.kernels.fused_nerf import (
    pack_nerf_params,
    fused_nerf_raw_t,
)

__all__ = ["pack_nerf_params", "fused_nerf_raw_t"]
