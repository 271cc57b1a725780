"""Full-res windowed-gather parameter sweep (serving path, isolated).

The 1008x756 serving frame spends its largest non-MXU slice in
``ops/warp.py:epipolar_colors_shared_windowed``. Its two statics —
``gather_tiles`` (contiguous ray tiles) and ``gather_window_rows``
(source-row band height) — were set analytically by
``render/renderer.py:resolve_gather_statics`` (band just under the
~2.3 MB staging cliff, ~2 tiles per band height). This probe sweeps the
grid around that point on the real frame geometry (row-major whole-frame
rays, fern-scale 17-view scene) and reports per-variant latency plus
window COVERAGE (fraction of in-bounds projections the band catches —
coverage 1.0 means bit-exact vs the unwindowed gather), so the serving
default is set by measurement, not arithmetic.

Usage: python scripts/bench_gather_window_sweep.py [--split]  (TPU, ~15 min)
  --split: sweep the split-word gather form (bench_gather_split.py decides
  which form wins; the optimum (tiles, rows) may differ between forms)
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SPLIT = "--split" in sys.argv


def main():
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.ops.warp import (
        epipolar_colors_shared,
        epipolar_colors_shared_windowed,
    )
    from pronerf_tpu.render.raygen import prepare_scene, rays_for_pose
    from pronerf_tpu.render.renderer import resolve_gather_statics
    from pronerf_tpu.models.pronerf import RenderStatics
    from pronerf_tpu.utils.profiling import readback
    from pronerf_tpu.utils.synthetic import make_scene

    H, W, V, S = 756, 1008, 4, 8
    sc = make_scene(n_views=17, H=H, W=W, focal=0.8 * W, seed=0)
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    rays = rays_for_pose(H, W, sc["K"], jnp.asarray(sc["poses"][0]))
    ro, rd = rays["or_o"], rays["or_d"]
    N = ro.shape[0]
    rng = np.random.default_rng(0)
    z3d = jnp.asarray(
        np.sort(rng.uniform(1.2, 5.5, (N, S)).astype(np.float32), -1))
    view_ids = jnp.arange(V, dtype=jnp.int32)
    imgs, M, K = scene["images"], scene["fused_mats"], scene["K"]

    def null_ms(reps=5):
        f0 = jax.jit(lambda x: x + 1.0)
        readback(f0(jnp.zeros(())))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            readback(f0(jnp.zeros(())))
            ts.append((time.perf_counter() - t0) * 1e3)
        return float(np.median(ts))

    null = null_ms()
    print(json.dumps({"dispatch_null_ms": round(null, 2), "n_rays": N}),
          flush=True)

    # Coverage is computed ON DEVICE against the unwindowed gather (the
    # color arrays are ~300 MB — never read them back through the tunnel):
    # fraction of ref-in-bounds points (nonzero ref color) whose windowed
    # color matches to 1e-6. coverage 1.0 => bit-exact vs unwindowed.
    def coverage_stat(fn):
        @jax.jit
        def cov(z):
            ref = epipolar_colors_shared(imgs, M, K, view_ids, ro, rd, z)
            out = fn(z)
            nz = jnp.abs(ref).sum(-1) > 0
            ok = (jnp.abs(out - ref).sum(-1) < 1e-6) & nz
            return ok.sum() / jnp.maximum(nz.sum(), 1)
        return float(cov(z3d))

    def timed(name, fn, iters=6, reps=3, with_cov=True):
        try:
            @jax.jit
            def loop(c):
                def body(c, _):
                    cols = fn(z3d + c * 1e-6)
                    return c + jnp.sum(cols) * 1e-12, ()
                c, _ = jax.lax.scan(body, c, None, length=iters)
                return c

            readback(loop(jnp.float32(0.0)))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                readback(loop(jnp.float32(0.0)))
                ts.append((time.perf_counter() - t0) * 1e3)
            ms = (float(np.median(ts)) - null) / iters
            rec = {"variant": name, "ms": round(ms, 3)}
            if with_cov:
                rec["coverage"] = round(coverage_stat(fn), 5)
            print(json.dumps(rec), flush=True)
            return ms
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)
            return None

    import dataclasses

    auto = resolve_gather_statics(
        dataclasses.replace(RenderStatics(), gather_tiles=-1), H, W, N)
    print(json.dumps({"auto_tiles": auto.gather_tiles,
                      "auto_window_rows": auto.gather_window_rows}),
          flush=True)

    timed("unwindowed_9.1MB", lambda z: epipolar_colors_shared(
        imgs, M, K, view_ids, ro, rd, z), with_cov=False)

    # Joint (window_rows, tiles) grid (r4, VERDICT next-1c): r3 anchored
    # wr198 x tiles{4,8,16,32} — tiles4 was 9 ms cheaper but lost coverage
    # (0.928), tiles16 reached 1.0 at +14 ms. The joint question: do wider
    # windows at fewer tiles (2.7-3.4 MB tables, the gray zone between the
    # 2.3 MB fast rate and the 3.1 MB slow rate) keep both? And do SMALLER
    # windows with more tiles stay on the fast rate at coverage 1.0?
    grid = [
        (auto.gather_window_rows, 8),   # the auto point (re-anchor)
        (auto.gather_window_rows, 16),  # r3 coverage-1.0 point (re-anchor)
        (280, 4), (256, 4),             # few tiles, wide (over-cliff) bands
        (240, 6), (220, 6),             # gray-zone tables
        (160, 12), (128, 16),           # sub-cliff bands, more tiles
        (160, 16), (128, 24),
    ]
    for wr, nt in grid:
        timed(f"wr{wr}_tiles{nt}" + ("_split" if SPLIT else ""),
              lambda z, nt=nt, wr=wr: epipolar_colors_shared_windowed(
                  imgs, M, K, view_ids, ro, rd, z, nt, wr, split=SPLIT))


if __name__ == "__main__":
    main()
