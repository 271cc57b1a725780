"""Release CLI: ``python -m pronerf_tpu.cli {train-stage1, train-stage2,
infer, eval, export}``.

Surface parity with the reference CLI (``pronerf/cli.py:173-221``): the same
five verbs (``export`` also answers to ``export-trt``), kebab-case flags
mapped onto the research-script snake_case config surface, defaults pointing
at the three fern release configs, and ``--`` passthrough of raw config
overrides (e.g. ``-- --i_weights 2``). Verbs dispatch to in-process drivers
instead of runpy-exec'ing research scripts.

TPU-native mappings:
- ``--use-trt`` selects the bfloat16 MXU fast path (FP16-engine analogue);
- ``export`` serializes the AOT XLA renderer instead of building TRT
  engines; ``--onnx-only`` is accepted and ignored with a note.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from pronerf_tpu.config import Config

REPO_ROOT = Path(__file__).resolve().parents[1]
DEFAULT_STAGE1_CONFIG = REPO_ROOT / "configs/llff/fern/fern_epi.txt"
DEFAULT_STAGE2_CONFIG = REPO_ROOT / "configs/llff/fern/fern_refine.txt"
DEFAULT_TRT_CONFIG = REPO_ROOT / "configs/llff/fern/fern_trt.txt"


def _parse_extra(extra: list[str]) -> dict:
    """``-- --key value`` / ``-- --flag`` passthrough onto Config fields."""
    if extra and extra[0] == "--":
        extra = extra[1:]
    out: dict = {}
    i = 0
    bool_fields = {
        name for name in Config.field_names()
        if isinstance(getattr(Config(), name), bool)
    }
    while i < len(extra):
        tok = extra[i]
        if not tok.startswith("--"):
            raise SystemExit(f"Unexpected passthrough token: {tok!r}")
        key = tok[2:].replace("-", "_")
        if key not in Config.field_names():
            raise SystemExit(f"Unknown config flag --{key}")
        if key in bool_fields and (
            i + 1 >= len(extra) or extra[i + 1].startswith("--")
        ):
            out[key] = True
            i += 1
        else:
            from pronerf_tpu.config import _coerce

            out[key] = _coerce(Config, key, extra[i + 1])
            i += 2
    return out


def _build_cfg(args, default_config, serving: bool = False) -> Config:
    overrides = _parse_extra(getattr(args, "extra", []))
    for name in ("max_steps", "no_reload", "pretrain_path", "render_test",
                 "use_trt", "max_images", "synthetic"):
        val = getattr(args, name, None)
        if name == "synthetic":
            if val:
                overrides["datadir"] = "synthetic"
            continue
        if val not in (None, False):
            overrides[name] = val
    ckpt = getattr(args, "checkpoint", None)
    if ckpt:
        overrides["ft_path"] = ckpt
    cfg = Config.from_file(args.config or default_config, **overrides)
    if serving and cfg.use_trt:
        # `--use-trt` means "the accelerated serving path" — default to the
        # ACTUAL serving graph (whole-frame single dispatch + fused Pallas
        # kernels) instead of requiring two passthrough flags. Explicit
        # `-- --tile_rays/--use_pallas` overrides still win.
        applied = []
        if "tile_rays" not in overrides:
            cfg = cfg.replace(tile_rays=0)
            applied.append("tile_rays=0")
        if "use_pallas" not in overrides:
            cfg = cfg.replace(use_pallas=True)
            applied.append("use_pallas=True")
        if applied:
            print(f"[SERVING] --use-trt defaults: {' '.join(applied)} "
                  "(override via `-- --tile_rays N --use_pallas False`)")
    return cfg


def cmd_train_stage1(args):
    from pronerf_tpu.train.loop import run_training

    run_training(_build_cfg(args, DEFAULT_STAGE1_CONFIG), stage=1)


def cmd_train_stage2(args):
    from pronerf_tpu.train.loop import run_training

    run_training(_build_cfg(args, DEFAULT_STAGE2_CONFIG), stage=2)


def cmd_infer(args):
    if getattr(args, "from_export", None):
        from pronerf_tpu.render.infer import run_inference_from_export

        run_inference_from_export(
            _build_cfg(args, DEFAULT_TRT_CONFIG), args.from_export,
            timing_reps=args.timing_reps,
        )
        return
    from pronerf_tpu.render.infer import run_inference

    run_inference(
        _build_cfg(args, DEFAULT_TRT_CONFIG, serving=True),
        timing_reps=args.timing_reps,
    )


def cmd_eval(args):
    args.render_test = True
    cmd_infer(args)


def cmd_train_multi(args):
    from pronerf_tpu.train.multi_loop import run_multi_training

    default = (
        DEFAULT_STAGE2_CONFIG if args.stage == 2 else DEFAULT_STAGE1_CONFIG
    )
    cfg = _build_cfg(args, default)
    datadirs = args.scenes.split(",") if args.scenes else [
        f"synthetic{i}" for i in range(args.n_synthetic)
    ]
    run_multi_training(
        cfg, datadirs, n_ray_shards=args.ray_shards, stage=args.stage
    )


def cmd_render_path(args):
    from pronerf_tpu.render.infer import run_render_path

    run_render_path(
        _build_cfg(args, DEFAULT_TRT_CONFIG, serving=True),
        n_frames=args.n_frames, fps=args.fps,
    )


def cmd_export(args):
    from pronerf_tpu.render.infer import run_export

    if getattr(args, "onnx_only", False):
        print("--onnx-only: note — this framework exports one AOT XLA "
              "executable; there is no intermediate ONNX stage.")
    run_export(
        _build_cfg(args, DEFAULT_TRT_CONFIG, serving=True),
        height=args.height, width=args.width,
    )


def _add_passthrough(p):
    p.add_argument(
        "extra", nargs=argparse.REMAINDER,
        help="raw config overrides forwarded after --, e.g. -- --i_weights 2",
    )
    p.add_argument("--synthetic", action="store_true",
                   help="use the built-in synthetic scene (no dataset needed)")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="python -m pronerf_tpu.cli",
        description="TPU-native ProNeRF: train / infer / export on LLFF scenes.",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("train-stage1", help="alternating sampler/NeRF training")
    p.add_argument("--config", default=None)
    p.add_argument("--no-reload", action="store_true", dest="no_reload")
    p.add_argument("--max-steps", type=int, default=None, dest="max_steps")
    _add_passthrough(p)
    p.set_defaults(func=cmd_train_stage1)

    p = sub.add_parser("train-stage2", help="joint refinement from a stage-1 ckpt")
    p.add_argument("--config", default=None)
    p.add_argument("--pretrain-path", default=None, dest="pretrain_path")
    p.add_argument("--no-reload", action="store_true", dest="no_reload")
    p.add_argument("--max-steps", type=int, default=None, dest="max_steps")
    _add_passthrough(p)
    p.set_defaults(func=cmd_train_stage2)

    p = sub.add_parser("infer", help="render held-out/test views")
    p.add_argument("--config", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--render-test", action="store_true", dest="render_test")
    p.add_argument("--use-trt", action="store_true", dest="use_trt",
                   help="bfloat16 fast path (FP16-engine analogue)")
    p.add_argument("--max-images", type=int, default=None, dest="max_images")
    p.add_argument("--timing-reps", type=int, default=0, dest="timing_reps",
                   help="timed re-renders per pose (reference uses 20)")
    p.add_argument("--from-export", default=None, dest="from_export",
                   metavar="DIR",
                   help="serve frames from a serialized `export` artifact "
                        "(runs the AOT executable, no re-compile)")
    _add_passthrough(p)
    p.set_defaults(func=cmd_infer)

    p = sub.add_parser("eval", help="render the test split through inference")
    p.add_argument("--config", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--use-trt", action="store_true", dest="use_trt")
    p.add_argument("--max-images", type=int, default=None, dest="max_images")
    p.add_argument("--timing-reps", type=int, default=0, dest="timing_reps")
    _add_passthrough(p)
    p.set_defaults(func=cmd_eval)

    p = sub.add_parser(
        "train-multi",
        help="training of several scenes in one SPMD program",
    )
    p.add_argument("--config", default=None)
    p.add_argument("--stage", type=int, default=1, choices=(1, 2),
                   help="1 = alternating stage-1, 2 = joint stage-2")
    p.add_argument("--pretrain-path", default=None, dest="pretrain_path",
                   help="stage-2: stage-1 multi expdir holding per-scene "
                        "scene_{name} checkpoints")
    p.add_argument("--scenes", default=None,
                   help="comma-separated datadirs (same resolution)")
    p.add_argument("--n-synthetic", type=int, default=2, dest="n_synthetic",
                   help="number of synthetic scenes when --scenes is unset")
    p.add_argument("--ray-shards", type=int, default=1, dest="ray_shards",
                   help="ray-axis shards per scene on the mesh")
    p.add_argument("--no-reload", action="store_true", dest="no_reload")
    p.add_argument("--max-steps", type=int, default=None, dest="max_steps")
    _add_passthrough(p)
    p.set_defaults(func=cmd_train_multi)

    p = sub.add_parser("render-path", help="render the spiral camera path to video")
    p.add_argument("--config", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--use-trt", action="store_true", dest="use_trt")
    p.add_argument("--n-frames", type=int, default=None, dest="n_frames")
    p.add_argument("--fps", type=int, default=30)
    _add_passthrough(p)
    p.set_defaults(func=cmd_render_path)

    for name in ("export", "export-trt"):
        p = sub.add_parser(
            name, help="AOT-compile + serialize the full-frame renderer"
        )
        p.add_argument("--config", default=None)
        p.add_argument("--checkpoint", default=None)
        p.add_argument("--onnx-only", action="store_true", dest="onnx_only")
        p.add_argument("--use-trt", action="store_true", dest="use_trt",
                       help="export the bfloat16 variant")
        p.add_argument("--height", type=int, default=756)
        p.add_argument("--width", type=int, default=1008)
        _add_passthrough(p)
        p.set_defaults(func=cmd_export)

    return parser


def enable_compilation_cache():
    """Persistent XLA compilation cache: the serving analogue of TRT engine
    deserialization (``trt_infer_v2.py:149-165`` loads machine code in
    seconds; without this every process re-compiles the whole-frame graph,
    minutes for the Pallas serving config). Cache dir defaults to
    ``~/.cache/pronerf_tpu/xla``; override with ``PRONERF_XLA_CACHE=<dir>``
    or disable with ``PRONERF_XLA_CACHE=off``. The cache is bounded with
    LRU eviction (default 12 GB; ``PRONERF_XLA_CACHE_MAX_GB`` overrides).
    The bound was 4 GB in round 4 until the cache filled to 3.99 GB and a
    back-to-back rerun of the SAME serving graph missed and recompiled
    (45 s) — an evicted hot entry costs a full recompile, so on a box
    with disk to spare the bound should comfortably exceed the working
    set (~10 MB/entry, results/probes_r4_coldstart.txt)."""
    import os

    cache = os.environ.get(
        "PRONERF_XLA_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "pronerf_tpu", "xla"),
    )
    if cache.lower() in ("", "off", "none", "0"):
        return None
    try:
        import jax

        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        max_gb = float(os.environ.get("PRONERF_XLA_CACHE_MAX_GB", "12"))
        if max_gb > 0:
            jax.config.update(
                "jax_compilation_cache_max_size", int(max_gb * 1e9)
            )
            # entries written before the LRU bound existed have no -atime
            # sidecar; the evictor raises on them during every put, which
            # makes NEW writes fail. Backfill from each file's mtime.
            for f in os.scandir(cache):
                if f.name.endswith("-cache"):
                    ap = os.path.join(cache, f.name[: -len("-cache")]
                                      + "-atime")
                    if not os.path.exists(ap):
                        ts = int(f.stat().st_mtime * 1e9)
                        with open(ap, "wb") as fh:
                            fh.write(ts.to_bytes(8, "little"))
        return cache
    except Exception as exc:  # cache is an optimization, never fatal
        print(f"[CACHE] persistent compilation cache unavailable: {exc}")
        return None


def _honor_platform_env():
    """Make ``JAX_PLATFORMS`` actually stick. With the axon TPU plugin
    registered, the env var alone is NOT honored (jax still initializes the
    TPU backend) — ``jax.config.update('jax_platforms', ...)`` must ALSO be
    set (the tests' conftest does the same). Without this, a user forcing
    ``JAX_PLATFORMS=cpu`` for a CPU render silently lands on the TPU —
    and a "CPU" smoke run can corrupt a concurrent TPU measurement."""
    import os

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def main(argv=None):
    _honor_platform_env()
    args = build_parser().parse_args(argv)
    enable_compilation_cache()
    args.func(args)


if __name__ == "__main__":
    main()
