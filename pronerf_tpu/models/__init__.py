from pronerf_tpu.models.mlp import (
    init_linear,
    linear,
    init_nerf_mlp,
    nerf_mlp_apply,
    init_minmax_mlp,
    minmax_mlp_apply,
    count_params,
)
from pronerf_tpu.models.pronerf import (
    init_pronerf_params,
    render_rays,
    RenderStatics,
)
