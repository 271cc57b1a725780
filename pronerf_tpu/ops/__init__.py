"""Pure-function ops library: rays, encodings, epipolar warp, sampling,
volume compositing, and image metrics. Everything here is shape-static,
jit-friendly, and differentiable where the pipeline needs gradients."""

from pronerf_tpu.ops.rays import (
    get_rays,
    get_rays_np,
    ndc_rays,
    ray_points,
    linspace_depths,
)
from pronerf_tpu.ops.encoding import (
    positional_encoding,
    posenc_dim,
    plucker,
)
from pronerf_tpu.ops.warp import (
    fuse_projection,
    bilinear_sample,
    project_points,
    epipolar_colors,
    mean_fill_invalid,
)
from pronerf_tpu.ops.sampling import (
    sort_with_payloads,
    ndc_to_3d_depth,
    bin_constrain,
    explore_expand,
    gap_jitter,
)
from pronerf_tpu.ops.composite import composite
from pronerf_tpu.ops.metrics import img2mse, mse2psnr, to8b, img2ssim
