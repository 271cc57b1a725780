"""Serving start-to-first-frame wall time at the fern serving config.

The reference deserializes TRT engines in seconds
(``trt_infer_v2.py:149-165``); our analogue is the persistent XLA
compilation cache (``pronerf_tpu.cli.enable_compilation_cache``). This
script measures process-start -> first rendered frame at 504x378 bf16 +
fused Pallas kernels (the headline serving graph). Run twice: the first
run compiles and populates the cache (minutes); the second deserializes
(seconds). ``--no-cache`` disables the cache for a true-cold baseline.

Usage: python scripts/bench_coldstart.py [--no-cache] [--res HxW]
"""

from __future__ import annotations

import pathlib
import sys
import time

T_START = time.time()

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    H, W = 378, 504
    for a in sys.argv[1:]:
        if a.startswith("--res"):
            h, w = sys.argv[sys.argv.index(a) + 1].split("x")
            H, W = int(h), int(w)
    if "--no-cache" not in sys.argv:
        from pronerf_tpu.cli import enable_compilation_cache

        print("cache:", enable_compilation_cache())

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pronerf_tpu.config import Config
    from pronerf_tpu.cli import DEFAULT_TRT_CONFIG
    from pronerf_tpu.models import init_pronerf_params
    from pronerf_tpu.render import prepare_scene
    from pronerf_tpu.render.infer import _infer_statics
    from pronerf_tpu.render.renderer import make_frame_renderer
    from pronerf_tpu.utils.profiling import readback
    from pronerf_tpu.utils.synthetic import make_scene

    cfg = Config.from_file(
        DEFAULT_TRT_CONFIG, datadir="synthetic", use_trt=True,
        tile_rays=0, use_pallas=True,
    )
    statics = _infer_statics(cfg, use_bf16=True)
    sc = make_scene(n_views=17, H=H, W=W, focal=0.8 * W, seed=0)
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(0))
    renderer = make_frame_renderer(
        statics, H, W, sc["K"], tile_rays=0, unroll=True
    )
    t_setup = time.time()
    out = renderer(params, scene, jnp.asarray(sc["poses"][0]))
    readback(out["rgb1"])
    assert np.all(np.isfinite(np.asarray(out["rgb1"])))
    t_frame = time.time()
    print(
        f"start-to-first-frame: {t_frame - T_START:.1f}s "
        f"(setup {t_setup - T_START:.1f}s, "
        f"compile+render {t_frame - t_setup:.1f}s) at {W}x{H}"
    )


if __name__ == "__main__":
    main()
