"""Op-level TPU profile of the serving frame render: captures a
jax.profiler trace and prints the top XLA ops by device time, parsed
locally from the xplane proto (no tensorboard UI needed).

Usage: python scripts/profile_ops.py [xla|pallas] [top_n]
"""

from __future__ import annotations

import collections
import glob
import json
import pathlib
import sys
import tempfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

MODE = sys.argv[1] if len(sys.argv) > 1 else "xla"
TOP_N = int(sys.argv[2]) if len(sys.argv) > 2 else 40
RES = sys.argv[3] if len(sys.argv) > 3 else "504x378"  # WxH
TRANSPOSED = (sys.argv[4].lower() in ("1", "true", "t")
              if len(sys.argv) > 4 else False)  # serving-pipeline layout


def main():
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.models import init_pronerf_params
    from pronerf_tpu.render import prepare_scene
    from pronerf_tpu.render.renderer import make_frame_renderer
    from pronerf_tpu.utils.profiling import readback
    from pronerf_tpu.utils.synthetic import make_scene

    W, H = (int(v) for v in RES.split("x"))
    sc = make_scene(n_views=17, H=H, W=W, focal=0.8 * W, seed=0)
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(0))
    # EXACTLY the bench statics so compiles hit the same persistent cache
    from pronerf_tpu.cli import DEFAULT_TRT_CONFIG
    from pronerf_tpu.config import Config
    from pronerf_tpu.render.infer import _infer_statics

    cfg = Config.from_file(
        DEFAULT_TRT_CONFIG, datadir="synthetic", use_trt=True, tile_rays=0,
        use_pallas=(MODE == "pallas"), transposed=TRANSPOSED,
    )
    statics = _infer_statics(cfg, use_bf16=True)
    renderer = make_frame_renderer(statics, H, W, sc["K"], tile_rays=0)
    c2w = jnp.asarray(sc["poses"][0])

    readback(renderer(params, scene, c2w)["rgb1"])  # warm

    from pronerf_tpu.utils.profiling import xplane_categories

    per_cat, per_op, total = xplane_categories(
        lambda i: readback(renderer(params, scene, c2w + i * 1e-7)["rgb1"]),
        iters=3,
    )
    for cat, ns in per_cat.most_common():
        print(json.dumps({
            "category": cat, "ms_per_frame": round(ns / 3e6, 3),
            "pct": round(100 * ns / total, 1),
        }))
    print(json.dumps({"mode": MODE, "transposed": TRANSPOSED,
                      "total_op_ms_3frames": round(total / 1e6, 2),
                      "per_frame_ms": round(total / 3e6, 2)}))
    for name, ns in per_op.most_common(TOP_N):
        print(json.dumps({
            "op": name[:110], "ms_per_frame": round(ns / 3e6, 3),
            "pct": round(100 * ns / total, 1),
        }))


if __name__ == "__main__":
    main()
