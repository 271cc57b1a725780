"""Serving start-to-first-frame wall time at the fern serving config,
broken down by phase.

The reference deserializes TRT engines in seconds
(``trt_infer_v2.py:149-165``); our analogue is the persistent XLA
compilation cache (``pronerf_tpu.cli.enable_compilation_cache``). This
script measures process-start -> first rendered frame at 504x378 bf16 +
fused Pallas kernels (the headline serving graph) and attributes the time
to phases:

  imports    : python interpreter + jax + pronerf_tpu module imports
  backend    : jax backend/client init (the tunnel session handshake)
  host_build : synthetic scene + params on host (numpy)
  device_put : scene/params upload + block
  trace      : jax tracing of the frame graph (renderer.lower)
  compile    : XLA compile — on a warm cache this is the cache read +
               executable deserialize, the TRT-engine analogue
  first_frame: first dispatch + host readback
  steady     : one more frame (dispatch + readback), for reference

Run twice: the first run compiles and populates the cache (minutes); the
second deserializes (seconds). ``--no-cache`` disables the cache for a
true-cold baseline.

Usage: python scripts/bench_coldstart.py [--no-cache] [--res HxW]
"""

from __future__ import annotations

import json
import os
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
    phases = {}
    t_prev = T_START

    def mark(name):
        nonlocal t_prev
        now = time.time()
        phases[name] = round(now - t_prev, 2)
        t_prev = now

    cache_dir = None
    if "--no-cache" not in sys.argv:
        from pronerf_tpu.cli import enable_compilation_cache

        cache_dir = enable_compilation_cache()

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

    mark("imports")

    jax.devices()  # force backend/client init (tunnel session handshake)
    mark("backend")

    cfg = Config.from_file(
        DEFAULT_TRT_CONFIG, datadir="synthetic", use_trt=True,
        tile_rays=0, use_pallas=True,
    )
    statics = _infer_statics(cfg, use_bf16=True)
    sc = make_scene(n_views=17, H=H, W=W, focal=0.8 * W, seed=0)
    scene_np = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params_host = init_pronerf_params(jax.random.PRNGKey(0))
    c2w = np.asarray(sc["poses"][0])
    mark("host_build")

    scene = jax.block_until_ready(jax.device_put(scene_np))
    params = jax.block_until_ready(jax.device_put(params_host))
    c2w_d = jax.block_until_ready(jnp.asarray(c2w))
    mark("device_put")

    renderer = make_frame_renderer(statics, H, W, sc["K"], tile_rays=0,
                                   unroll=True)
    lowered = renderer.lower(params, scene, c2w_d)
    mark("trace")

    compiled = lowered.compile()
    mark("compile")

    # Force the REAL input upload + the first device round-trip with a
    # trivial executable, so `first_frame` below isolates the serving
    # executable's program-load + execute. (block_until_ready returns
    # early through the axon tunnel, so the device_put phase above can
    # under-report the upload — this readback cannot.)
    leaves = jax.tree_util.tree_leaves((params, scene))
    touch = jax.jit(lambda *xs: sum(x.ravel()[0].astype(jnp.float32)
                                    for x in xs))
    readback(touch(*leaves))
    mark("touch_inputs")

    out = compiled(params, scene, c2w_d)
    readback(out["rgb1"])
    assert np.all(np.isfinite(np.asarray(out["rgb1"])))
    mark("first_frame")

    out = compiled(params, scene, c2w_d + 1e-7)
    readback(out["rgb1"])
    mark("steady")

    # Second executable load in the SAME process: recompile from the
    # cache and dispatch once. Separates per-process one-time device
    # init (only in first_frame above) from per-executable load cost.
    compiled2 = renderer.lower(params, scene, c2w_d).compile()
    mark("reload_compile")
    out = compiled2(params, scene, c2w_d + 2e-7)
    readback(out["rgb1"])
    mark("reload_first_frame")

    total = time.time() - T_START
    cache_bytes = None
    if cache_dir and os.path.isdir(cache_dir):
        cache_bytes = sum(
            f.stat().st_size for f in pathlib.Path(cache_dir).rglob("*")
            if f.is_file()
        )
    print(json.dumps({
        "res": f"{W}x{H}",
        "total_s": round(total, 1),
        "phases_s": phases,
        "cache": cache_dir,
        "cache_mb": round(cache_bytes / 1e6, 1) if cache_bytes else None,
    }))


if __name__ == "__main__":
    main()
