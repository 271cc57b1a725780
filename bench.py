"""Headline benchmark: LLFF-Fern-shaped full-frame render latency on TPU.

Protocol (mirrors the reference's measurement machinery, BASELINE.md):
- fern training resolution 504x378 (factor 4), 8 samples/ray, 48
  ray-encoding points, 4 neighbor views, the release model sizes;
- the SERVING configuration, reachable verbatim from the CLI:
  ``python -m pronerf_tpu.cli infer --use-trt --timing-reps 20 --
  --tile_rays 0`` — bfloat16 MXU fast path (the analogue of the TRT FP16
  engines; bit-exact colors for 8-bit sources) and the whole frame as one
  dispatch;
- per-frame latency amortized over a scan of renders inside ONE dispatch,
  minus the measured null dispatch+readback time. (This matters here: the
  tunneled TPU adds ~30 ms per dispatch round-trip, and its
  block_until_ready returns early, so naive per-call timing is wrong in
  both directions. The reference's 20x CUDA-event loop measures the same
  steady-state quantity.)

The reference publishes no numbers (BASELINE.json: "published": {}), so
``vs_baseline`` is reported against the real-time budget the paper's
headline claim implies: 30 FPS at this resolution = 33.33 ms/frame.
vs_baseline > 1 means faster than that budget. ``extra`` carries analytic
MACs and model FLOP utilization so perf progress is normalized across
hardware.

Scene content is synthetic (no LLFF data ships with this machine); latency
depends on shapes, not pixel values.
"""

from __future__ import annotations

import json

import numpy as np

# bf16 peak matmul throughput per chip, by device_kind substring.
PEAK_BF16_TFLOPS = {
    "v5 lite": 197.0,  # TPU v5e
    "v5e": 197.0,
    "v5p": 459.0,
    "v4": 275.0,
    "v6": 918.0,
}


def _peak_tflops(device_kind: str):
    dk = device_kind.lower()
    for key, val in PEAK_BF16_TFLOPS.items():
        if key in dk:
            return val
    return None


def _null_ms(reps: int = 5) -> float:
    from pronerf_tpu.utils.profiling import null_dispatch_ms

    return null_dispatch_ms(reps)


def run_bench(H=378, W=504, frames_per_loop=6, reps=4, statics_overrides=None,
              pack_corners="u8", n_samples=8, num_neighbor=4):
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.cli import enable_compilation_cache

    enable_compilation_cache()  # serving graphs deserialize in seconds

    from pronerf_tpu.config import Config
    from pronerf_tpu.models import init_pronerf_params
    from pronerf_tpu.render import prepare_scene
    from pronerf_tpu.render.infer import _infer_statics
    from pronerf_tpu.render.renderer import make_frame_renderer
    from pronerf_tpu.utils.profiling import amortized_timer, readback
    from pronerf_tpu.utils.synthetic import make_scene

    # The serving configuration AS THE CLI EXPRESSES IT (no bench-only
    # knobs): bf16 fast path + whole-frame single dispatch + the fused
    # transposed NeRF kernel.
    from pronerf_tpu.cli import DEFAULT_TRT_CONFIG

    cfg = Config.from_file(
        DEFAULT_TRT_CONFIG,
        datadir="synthetic", use_trt=True, tile_rays=0, use_pallas=True,
        N_samples=n_samples, num_neighbor=num_neighbor,
    )
    statics = _infer_statics(cfg, use_bf16=True)
    if statics_overrides:
        import dataclasses

        statics = dataclasses.replace(statics, **statics_overrides)

    # Fern-scale scene: 17 training views at the bench resolution.
    sc = make_scene(n_views=17, H=H, W=W, focal=0.8 * W, seed=0)
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"],
                          pack_corners=pack_corners)
    params = init_pronerf_params(
        jax.random.PRNGKey(0), N_samples=n_samples, num_neighbor=num_neighbor
    )
    renderer = make_frame_renderer(
        statics, H, W, sc["K"], tile_rays=cfg.tile_rays, unroll=True
    )
    c2w = jnp.asarray(sc["poses"][0])

    out = renderer(params, scene, c2w)  # compile + warm
    readback(out["rgb1"])
    assert np.all(np.isfinite(np.asarray(out["rgb1"])))

    null = _null_ms()

    # Un-amortized single-dispatch latency: one frame call + host readback,
    # wall-clock, NO null subtraction — the user-visible first-frame number
    # on a non-pipelined client. On this tunneled backend it includes the
    # ~27 ms host round-trip; on local hardware it is the honest per-frame
    # latency, which the amortized steady-state number below understates.
    import time as _time

    singles = []
    for i in range(3):
        t0 = _time.perf_counter()
        readback(renderer(params, scene, c2w + 1e-7 * (i + 1))["rgb1"])
        singles.append((_time.perf_counter() - t0) * 1e3)
    single_ms = float(np.median(singles))

    def frame_step(c):
        o = renderer(params, scene, c2w + 1e-7 * c)
        return c + o["rgb1"][0, 0, 0] * 1e-9

    samples = [
        amortized_timer(frame_step, jnp.float32(0), iters=frames_per_loop,
                        null_ms=null)
        for _ in range(reps)
    ]
    ms = float(np.median(samples))
    return ms, H * W / ms * 1e3, null, single_ms


def _schedule_steps(sched):
    """Total nominal steps of a probe 'schedule' string like '60000+30000'."""
    try:
        return sum(int(x) for x in str(sched).split("+"))
    except ValueError:
        return -1


def _codesign_quality_delta(path=None):
    """Measured quality cost of the fast V=2 point, from the committed
    matched-schedule training A/B (results/probes_r4_codesign.txt: control
    S8V4 vs candidate S8V2, identical schedule/scene/seed through the
    released CLI).

    Rows are paired by (S, V, schedule) — a control and a candidate are
    only ever compared at the SAME schedule (round-4 regression: keying by
    (S, V) alone let a later 30k candidate row overwrite the 60k one and
    published a cross-schedule delta). The reported delta is the longest
    matched schedule present; the full per-schedule trend is attached so
    the trajectory (converging/widening) rides with the headline number.
    Returns {} if the probe artifact is absent or no schedule has both
    arms."""
    import os
    if path is None:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results", "probes_r4_codesign.txt")
    rows = {}
    try:
        with open(path) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except ValueError:
                    continue
                if r.get("phase") == "quality" and r.get("psnr_rgb1"):
                    rows[(r["S"], r["V"], str(r.get("schedule")))] = r
    except OSError:
        return {}
    matched = []  # (total_steps, schedule, delta_db)
    for (s, v, sched), cand in rows.items():
        if (s, v) != (8, 2):
            continue
        ctrl = rows.get((8, 4, sched))
        if not ctrl:
            continue
        matched.append((
            _schedule_steps(sched), sched,
            round(cand["psnr_rgb1"] - ctrl["psnr_rgb1"], 2),
        ))
    if not matched:
        return {}
    matched.sort()
    _, sched, delta = matched[-1]
    deltas = [d for _, _, d in matched]
    out = {
        "fast_v2_psnr_delta_db": delta,
        "fast_v2_quality_protocol": "matched %s-step schedule A/B, "
        "synthetic fern-scale scene (schedule-matched pairing; flags are "
        "marginal on resume — see results/probes_r4_codesign.txt + "
        "DESIGN.md trend table for absolute steps). The trend is "
        "NON-MONOTONIC: past ~90k stage-1 steps the proxy scene stops "
        "resolving the V axis (control overfits), so quote the range, "
        "not one point" % sched,
        "fast_v2_delta_trend_db": {
            s: d for _, s, d in matched},
        "fast_v2_delta_range_db": [min(deltas), max(deltas)],
    }
    # Surgery bootstrap context (round 5): V=2 derived from the
    # full-schedule V=4 teacher + a SHORT fine-tune — a cheap derivation
    # path, NOT the V=2 optimum (the 210k from-scratch arm measured
    # higher; results/probes_r5_surgery.txt, DESIGN.md surgery section).
    surgery = os.path.join(os.path.dirname(path), "probes_r5_surgery.txt")
    try:
        with open(surgery) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except ValueError:
                    continue
                if (r.get("phase") == "surgery_v2" and r.get("psnr_rgb1")
                        and r.get("views", 2) == 2):
                    out["fast_v2_surgery_psnr_db"] = round(r["psnr_rgb1"], 2)
                    out["fast_v2_surgery_protocol"] = (
                        "V=4 full-schedule teacher -> refine first-layer "
                        "surgery -> %dk stage-2 fine-tune at V=2; a cheap "
                        "bootstrap of the fast point, not its optimum"
                        % (r["finetune_steps"] // 1000))
    except OSError:
        pass
    return out


def _v_curve_summary(path=None):
    """The measured num_neighbor operating-point curve at the reference's
    full-res engine sizing (1008x756), assembled from the committed probe
    artifacts (results/probes_r4_codesign.txt latency+quality rows,
    results/probes_r5_surgery.txt): per V, the newest measured frame
    latency, the from-scratch trained quality at the longest schedule
    probed, and the surgery-bootstrap quality where measured. Quality
    numbers are synthetic-scene short-schedule proxies (same caveat as
    fast_v2_*); latency is hardware-measured. Returns {} if the latency
    artifact is absent."""
    import os
    if path is None:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results", "probes_r4_codesign.txt")
    lat, qual = {}, {}
    try:
        with open(path) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except ValueError:
                    continue
                if r.get("S") != 8:
                    continue
                if (r.get("phase") == "latency"
                        and r.get("res") == "1008x756"):
                    lat[r["V"]] = r  # newest row wins
                elif r.get("phase") == "quality" and r.get("psnr_rgb1"):
                    prev = qual.get(r["V"])
                    steps = _schedule_steps(r.get("schedule"))
                    if prev is None or steps >= _schedule_steps(
                            prev.get("schedule")):
                        qual[r["V"]] = r
    except OSError:
        return {}
    if not lat:
        return {}
    surgery = {}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(path)),
                               "probes_r5_surgery.txt")) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except ValueError:
                    continue
                if r.get("phase") == "surgery_v2" and r.get("psnr_rgb1"):
                    surgery[r.get("views", 2)] = r
    except OSError:
        pass
    curve = {}
    for v in sorted(lat):
        row = {
            "full_res_ms": round(lat[v]["ms"], 2),
            "mrays_per_sec": round(lat[v]["mrays_per_sec"], 2),
        }
        if v in qual:
            row["scratch_psnr_db"] = round(qual[v]["psnr_rgb1"], 2)
            row["scratch_schedule"] = str(qual[v].get("schedule"))
        if v in surgery:
            row["surgery_psnr_db"] = round(surgery[v]["psnr_rgb1"], 2)
        curve[str(v)] = row
    return {
        "v_curve_1008x756": curve,
        "v_curve_protocol": "per num_neighbor V at S=8: hardware-measured "
            "full-res frame latency (bench protocol); scratch quality = "
            "held-out PSNR from a matched-schedule synthetic-scene training "
            "A/B at the longest schedule probed; surgery quality = V=4 "
            "full-schedule teacher + 15k fine-tune. The reference's TRT "
            "engines hard-code V=4 (trt_infer_v2.py:180,262,344) — this "
            "axis exists because the framework owns training",
    }


def main():
    H, W = 378, 504
    ms, rays_per_s, null, single_ms = run_bench(H, W)
    budget_ms = 1000.0 / 30.0  # 30 FPS real-time budget at 504x378

    # Second operating point: the reference's full-res engine sizing
    # (1008x756, trt_infer_v2.py:180,344) through the windowed gather.
    full_res = {}
    try:
        fms, frps, _, fsingle = run_bench(756, 1008, frames_per_loop=4, reps=3)
        full_res = {
            "full_res_1008x756_ms": round(fms, 2),
            "full_res_mrays_per_sec": round(frps / 1e6, 2),
            "full_res_single_dispatch_ms": round(fsingle, 2),
        }
    except Exception as exc:  # full-res must never kill the headline bench
        full_res = {"full_res_error": str(exc)[:160]}

    # Third operating point: the co-designed fast point (num_neighbor=2;
    # NeRF and sampler untouched). The reference's TRT engines hard-code
    # V=4 in their input bindings (trt_infer_v2.py:180,262,344) — the
    # operating point is a config flag here, so the reduced-V model can be
    # trained and its quality cost measured rather than guessed. The
    # matched-schedule quality A/B lives in results/probes_r4_codesign.txt;
    # its measured PSNR delta is attached below when present.
    fast = {}
    try:
        vms, vrps, _, _ = run_bench(756, 1008, frames_per_loop=4, reps=3,
                                    num_neighbor=2)
        fast = {
            "fast_v2_1008x756_ms": round(vms, 2),
            "fast_v2_mrays_per_sec": round(vrps / 1e6, 2),
            **_codesign_quality_delta(),
        }
    except Exception as exc:
        fast = {"fast_v2_error": str(exc)[:160]}

    import jax

    from pronerf_tpu.utils.profiling import pipeline_macs

    macs = pipeline_macs(H, W)
    total_flops = 2.0 * sum(macs.values())
    achieved_tflops = total_flops / (ms * 1e-3) / 1e12
    device_kind = jax.devices()[0].device_kind
    peak = _peak_tflops(device_kind)

    result = {
        "metric": "llff_fern_504x378_render_ms_per_frame_bf16",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(budget_ms / ms, 3),
        "extra": {
            "rays_per_sec": round(rays_per_s),
            "dispatch_null_ms": round(null, 2),
            "single_dispatch_ms": round(single_ms, 2),
            "single_dispatch_protocol": "one frame call + host readback, "
                "wall-clock, median of 3, NO null subtraction — includes "
                "this backend's ~27 ms tunnel round-trip; the user-visible "
                "un-pipelined latency",
            "samples_per_ray": 8,
            "warp": "u8-packed corner gather",
            "serving_config": "whole-frame single dispatch + fused "
                              "transposed NeRF kernel",
            "repro_cli": "python -m pronerf_tpu.cli infer --use-trt "
                         "--timing-reps 20  (serving graph is the "
                         "--use-trt default since r3)",
            "analytic_gmacs_per_frame": round(sum(macs.values()) / 1e9, 2),
            "achieved_model_tflops": round(achieved_tflops, 1),
            "device_kind": device_kind,
            **({"model_flop_util": round(
                achieved_tflops / peak, 4)} if peak else {}),
            **full_res,
            **fast,
            **_v_curve_summary(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
