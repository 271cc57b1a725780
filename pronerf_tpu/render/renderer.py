"""Full-frame rendering: one AOT-compilable XLA graph over fixed-size ray
tiles — the TPU-native replacement for the reference's ONNX -> TensorRT FP16
engine path (``onnx2trt.py``, ``trt_infer_v2.py``).

Design:
- a frame is H*W rays padded to a multiple of ``tile_rays``; a ``lax.map``
  over [n_tiles, tile, ...] keeps peak memory flat while XLA pipelines the
  tiles (the reference instead chunks host-side or relies on 8-sample
  sparsity to fit a whole frame);
- everything per-pose (ray generation, neighbor selection, fused warp
  matrices) happens inside the one jitted function, so per-frame host work
  is a single dispatch;
- ``compute_dtype='bfloat16'`` runs the three MLPs in bf16 on the MXU with
  f32 accumulation — the analogue of the TRT FP16 engines.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pronerf_tpu.models.pronerf import RenderStatics, render_rays
from pronerf_tpu.render.raygen import rays_for_pose


def _pad_and_tile(rays, tile: int):
    n = rays["ndc_o"].shape[0]
    n_tiles = -(-n // tile)
    pad = n_tiles * tile - n

    def prep(x):
        x = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        return x.reshape(n_tiles, tile, *x.shape[1:])

    return {k: prep(v) for k, v in rays.items()}, n


GATHER_CLIFF_BYTES = 2.4e6  # measured v5e gather staging threshold (~2.3MB)


def resolve_gather_statics(
    statics: RenderStatics, H: int, W: int, rays_per_call: int
) -> RenderStatics:
    """Resolve ``gather_tiles == -1`` (auto): enable the windowed epipolar
    gather when a packed source view exceeds the v5e gather staging cliff
    (full-res serving), sized so each window sits under it with ~half the
    band left for disparity spread. No-op below the cliff or when set
    explicitly."""
    import dataclasses

    if statics.gather_tiles != -1:
        return statics
    if H * W * 12 <= GATHER_CLIFF_BYTES:
        return dataclasses.replace(statics, gather_tiles=0)
    window_rows = max(64, int(GATHER_CLIFF_BYTES // (W * 12)))
    rows_per_call = max(1, rays_per_call // W)
    n_tiles = max(1, round(rows_per_call / max(window_rows // 2, 1)))
    return dataclasses.replace(
        statics, gather_tiles=n_tiles, gather_window_rows=window_rows
    )


def make_frame_renderer(
    statics: RenderStatics,
    H: int,
    W: int,
    K,
    tile_rays: int = 8192,
    unroll: bool = False,
):
    """Build a jitted (params, scene, c2w) -> frame dict renderer.

    ``unroll=True`` python-unrolls the tile loop inside the jit instead of
    ``lax.map`` — measured ~11 ms/frame faster at fern scale (no per-
    iteration loop machinery, XLA schedules across tiles) at the price of
    a longer compile; right for serving, wrong for quick eval renders.

    ``tile_rays=0`` (or >= H*W) selects the SERVING configuration: the whole
    frame as one tile in a single dispatch — measured another ~6 ms/frame
    faster than 16k tiles at fern scale (504x378). This is what ``bench.py``
    times and what ``--tile_rays 0`` selects from the CLI.
    """
    K = np.asarray(K)
    if not tile_rays or tile_rays >= H * W:
        tile_rays, unroll = H * W, True
        # NOTE: padding the tile up to a kernel-block multiple here was
        # measured at +3.4 ms/frame (504x378) — the jnp.pad of the ray
        # bundle breaks producer fusions; the kernels' internal pads are
        # far cheaper. Keep the exact frame size.
    statics = resolve_gather_statics(statics, H, W, tile_rays)

    def render_frame(params, scene, c2w):
        # pack once, outside the tile loop
        from pronerf_tpu.kernels.packing import pack_serving_params

        params = pack_serving_params(params, statics)
        rays = rays_for_pose(H, W, K, c2w)
        tiled, n = _pad_and_tile(rays, tile_rays)
        controls = {
            "rng": jax.random.PRNGKey(0),
            "target_t": jnp.asarray(c2w)[:3, 3],
        }
        rr_fn = render_rays
        if statics.transposed:
            from pronerf_tpu.models.pronerf_t import (
                render_rays_t,
                transposed_eligible,
            )

            if transposed_eligible(statics, scene["images"]):
                rr_fn = render_rays_t

        def body(tile_rays_):
            out = rr_fn(params, tile_rays_, scene, controls, statics)
            return {
                "rgb1": out["rgb1"],
                "rgb0": out["rgb0"],
                "depth": out["depth"],
                "mm_rgb": out["mm_rgb"],
                "depth0": out["depth0"],
            }

        if unroll:
            n_tiles = tiled["ndc_o"].shape[0]
            outs = [
                body({k: v[i] for k, v in tiled.items()})
                for i in range(n_tiles)
            ]
            out = {
                k: jnp.stack([o[k] for o in outs], 0) for k in outs[0]
            }
        else:
            out = jax.lax.map(body, tiled)
        flat = {k: v.reshape(-1, *v.shape[2:])[:n] for k, v in out.items()}
        return {
            "rgb1": flat["rgb1"].reshape(H, W, 3),
            "rgb0": flat["rgb0"].reshape(H, W, 3),
            "depth": flat["depth"].reshape(H, W),
            "mm_rgb": flat["mm_rgb"].reshape(H, W, 3),
            "depth0": flat["depth0"].reshape(H, W),
        }

    return jax.jit(render_frame)


def render_path(
    render_poses,
    params,
    scene,
    statics: RenderStatics,
    H: int,
    W: int,
    K,
    gt_imgs=None,
    savedir: Optional[str] = None,
    tile_rays: int = 8192,
    timing_reps: int = 0,
    render_factor: int = 0,
):
    """Render a pose list; save PNGs and report PSNR like the reference's
    ``render_path`` (``run_S_eS_eN_alter_base.py:292-372``): per-pose PNG
    dumps with ``{i:03d}.png`` / ``rgb0_`` / ``depth_`` / ``gt_`` prefixes
    and mean test PSNR for both the NeRF output (rgb1) and the refine-net
    output (rgb0).

    ``timing_reps > 0`` re-renders each pose that many times and prints
    ``Render path time:`` per rep — the reference's 20x benchmark protocol
    (``run_S_eS_eN_alter_trt.py:326-332``). Timing is READBACK-synced, not
    ``block_until_ready`` (which returns early on the tunneled axon
    backend, see utils/profiling.py), and a steady-state ms/frame is also
    measured once by amortizing a ``lax.scan`` of frame renders inside one
    dispatch minus the measured null-dispatch floor — the same protocol as
    ``bench.py``, so the CLI reproduces the headline number.
    """
    from pronerf_tpu.ops.metrics import to8b
    from pronerf_tpu.utils.profiling import (
        amortized_timer,
        null_dispatch_ms,
        readback,
    )

    if render_factor != 0:
        H, W = H // render_factor, W // render_factor
        K = np.asarray(K) / render_factor
        K = np.concatenate([K[:2], [[0, 0, 1]]], 0)

    renderer = make_frame_renderer(statics, H, W, K, tile_rays)
    rgbs0, rgbs1, depths, psnrs, psnrs0, times_ms = [], [], [], [], [], []
    null_ms = amortized_ms = None

    for i, c2w in enumerate(np.asarray(render_poses)):
        c2w = jnp.asarray(c2w[:3, :4])
        out = renderer(params, scene, c2w)
        readback(out["rgb1"])  # true sync (block_until_ready lies on axon)
        if timing_reps > 0:
            if null_ms is None:
                null_ms = null_dispatch_ms()
            for _ in range(timing_reps):
                t0 = time.perf_counter()
                readback(renderer(params, scene, c2w)["rgb1"])
                ms = (time.perf_counter() - t0) * 1e3
                times_ms.append(ms)
                print(f"Render path time: {ms:.3f}")
            if amortized_ms is None:
                # Steady-state per-frame cost: scan of renders in ONE
                # dispatch, minus the null-dispatch floor (bench.py's
                # protocol) — measured once, the graph is pose-independent.
                iters = max(2, min(timing_reps, 6))

                def frame_step(c, _c2w=c2w):
                    o = renderer(params, scene, _c2w + 1e-7 * c)
                    return c + o["rgb1"][0, 0, 0] * 1e-9

                amortized_ms = amortized_timer(
                    frame_step, jnp.float32(0), iters=iters, null_ms=null_ms
                )
                print(
                    f"Steady-state render ms/frame (scan x{iters} minus "
                    f"{null_ms:.1f} ms null dispatch): {amortized_ms:.3f}"
                )
        rgb1 = np.asarray(out["rgb1"])
        rgb0 = np.asarray(out["rgb0"])
        depth = np.asarray(out["depth"])
        rgbs1.append(rgb1)
        rgbs0.append(rgb0)
        depths.append(depth)

        if gt_imgs is not None and render_factor == 0:
            gt = np.asarray(gt_imgs[i])
            psnrs.append(-10.0 * np.log10(np.mean((rgb1 - gt) ** 2)))
            psnrs0.append(-10.0 * np.log10(np.mean((rgb0 - gt) ** 2)))

        if savedir is not None:
            import imageio.v2 as imageio
            from pathlib import Path

            savedir = Path(savedir)
            savedir.mkdir(parents=True, exist_ok=True)
            imageio.imwrite(savedir / f"{i:03d}.png", to8b(rgb1))
            imageio.imwrite(savedir / f"rgb0_{i:03d}.png", to8b(rgb0))
            imageio.imwrite(
                savedir / f"depth_{i:03d}.png", to8b(depth / max(depth.max(), 1e-8))
            )
            if gt_imgs is not None:
                imageio.imwrite(
                    savedir / f"gt_{i:03d}.png", to8b(np.asarray(gt_imgs[i]))
                )

    result = {
        "rgbs0": np.stack(rgbs0) if rgbs0 else None,
        "rgbs1": np.stack(rgbs1) if rgbs1 else None,
        "depths": np.stack(depths) if depths else None,
        "psnrs": psnrs,
        "psnrs0": psnrs0,
        "times_ms": times_ms,
        "amortized_ms": amortized_ms,
        "null_ms": null_ms,
    }
    if psnrs:
        print(psnrs)
        print(f"Mean Test PSNR {float(np.mean(psnrs))}")
    if psnrs0:
        print(psnrs0)
        print(f"Mean Test PSNR {float(np.mean(psnrs0))}")
    return result


def save_video(frames, path, fps: int = 30) -> str:
    """Write a [N, H, W, 3] float stack as mp4 (gif fallback when no ffmpeg
    backend is available). Used by the ``render-path`` spiral video verb."""
    import imageio.v2 as imageio

    from pronerf_tpu.ops.metrics import to8b

    frames8 = [to8b(f) for f in np.asarray(frames)]
    path = str(path)
    try:
        imageio.mimwrite(path, frames8, fps=fps, quality=8)
        return path
    except Exception:
        gif = path.rsplit(".", 1)[0] + ".gif"
        imageio.mimwrite(gif, frames8, duration=1.0 / fps)
        return gif
