"""Headline benchmark: LLFF-Fern-shaped full-frame render latency on TPU.

Protocol (mirrors the reference's measurement machinery, BASELINE.md):
- fern training resolution 504x378 (factor 4), 8 samples/ray, 48
  ray-encoding points, 4 neighbor views, the release model sizes;
- the bfloat16 MXU fast path (the analogue of the TRT FP16 engines);
- per-frame latency = median of 20 timed renders after warmup, matching the
  reference's 20x CUDA-event protocol (``run_S_eS_eN_alter_trt.py:326-332``).

The reference publishes no numbers (BASELINE.json: "published": {}), so
``vs_baseline`` is reported against the real-time budget the paper's
headline claim implies: 30 FPS at this resolution = 33.33 ms/frame.
vs_baseline > 1 means faster than that budget.

Scene content is synthetic (no LLFF data ships with this machine); latency
depends on shapes, not pixel values.
"""

from __future__ import annotations

import json
import time

import numpy as np


def run_bench(H=378, W=504, reps=20, compute_dtype="bfloat16"):
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.models import RenderStatics, init_pronerf_params
    from pronerf_tpu.render import prepare_scene
    from pronerf_tpu.render.renderer import make_frame_renderer
    from pronerf_tpu.utils.synthetic import make_scene

    # Fern-scale scene: 17 training views at the bench resolution.
    sc = make_scene(n_views=17, H=H, W=W, focal=0.8 * W, seed=0)
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(0))
    statics = RenderStatics.infer(compute_dtype=compute_dtype)
    renderer = make_frame_renderer(statics, H, W, sc["K"], tile_rays=16384)
    c2w = jnp.asarray(sc["poses"][0])

    out = jax.block_until_ready(renderer(params, scene, c2w))  # compile+warm
    assert np.all(np.isfinite(np.asarray(out["rgb1"])))

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(renderer(params, scene, c2w))
        times.append((time.perf_counter() - t0) * 1e3)
    ms = float(np.median(times))
    rays_per_s = H * W / ms * 1e3
    return ms, rays_per_s, times


def main():
    ms, rays_per_s, times = run_bench()
    budget_ms = 1000.0 / 30.0  # 30 FPS real-time budget at 504x378
    result = {
        "metric": "llff_fern_504x378_render_ms_per_frame_bf16",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(budget_ms / ms, 3),
        "extra": {
            "rays_per_sec": round(rays_per_s),
            "min_ms": round(float(np.min(times)), 3),
            "reps": len(times),
            "samples_per_ray": 8,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
