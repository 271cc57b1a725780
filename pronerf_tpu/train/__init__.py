from pronerf_tpu.train.state import (
    make_tx,
    apply_updates,
    stage1_lr,
    stage2_lr,
)
from pronerf_tpu.train.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    latest_checkpoint,
)
from pronerf_tpu.train.stage1 import make_stage1_steps, init_stage1_state
from pronerf_tpu.train.stage2 import make_stage2_step, init_stage2_state
