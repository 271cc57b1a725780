from pronerf_tpu.parallel.data_parallel import (
    make_ray_mesh,
    shard_stage1_steps,
    shard_stage2_step,
    shard_batch,
    replicate,
)
from pronerf_tpu.parallel.render_parallel import make_sharded_frame_renderer
