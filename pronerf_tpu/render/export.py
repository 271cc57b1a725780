"""AOT export of the inference renderer — the TPU-native replacement for
ONNX -> TensorRT engine building AND engine execution
(``onnx2trt.py:7-55``, ``run_S_eS_eN_alter_trt.py:377-409``,
``trt_infer_v2.py:149-394``).

Instead of exporting the three MLPs separately and re-stitching them with
device buffers at runtime, the WHOLE frame pipeline (sampler -> warp ->
refine -> NeRF -> compositing, tiled) is lowered once via ``jax.export``
into a serialized StableHLO executable, bundled with msgpack'd params, the
prepared reference-view scene, and a JSON manifest carrying the full
``RenderStatics`` so a non-default model (e.g. ``netarch=donerf`` or a
different ``N_samples``/``num_neighbor``) round-trips exactly.
``expected_artifact_paths`` mirrors ``pronerf/tensorrt.py:8-14`` for CLI
surface parity; serving from the artifact (``load_exported_renderer`` +
calling it) is the analogue of running the deserialized engines
(``trt_infer_v2.py:149-229``).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import numpy as np
from jax import export as jax_export

from pronerf_tpu.models.pronerf import RenderStatics
from pronerf_tpu.render.renderer import make_frame_renderer
from pronerf_tpu.train.checkpoint import load_checkpoint, save_checkpoint


def expected_artifact_paths(export_dir) -> dict:
    """The file names an export produces (engine-path parity helper)."""
    export_dir = Path(export_dir)
    return {
        "executable": export_dir / "render_frame.xla",
        "params": export_dir / "params.ckpt",
        "manifest": export_dir / "manifest.json",
    }


def _statics_to_json(statics: RenderStatics) -> dict:
    d = dataclasses.asdict(statics)
    for k, v in d.items():
        if isinstance(v, tuple):
            d[k] = list(v)
    return d


def statics_from_manifest(manifest: dict) -> RenderStatics:
    """Rebuild the exported graph's RenderStatics from its manifest."""
    d = dict(manifest["statics"])
    for k in ("netskips", "mmnetskips"):
        d[k] = tuple(d[k])
    return RenderStatics(**d)


def export_renderer(
    params,
    scene,
    export_dir,
    H: int,
    W: int,
    K,
    tile_rays: int = 8192,
    statics: RenderStatics | None = None,
    compute_dtype=None,
    unroll: bool = False,
):
    """Lower + serialize the frame renderer for (H, W); bundle params+scene.

    Pass the full ``statics`` of the model being exported; the legacy
    ``compute_dtype``-only form builds default inference statics (which
    would mis-serve a non-default checkpoint — callers with a Config should
    always pass statics).
    """
    if statics is None:
        statics = RenderStatics.infer(compute_dtype=compute_dtype)
    # Resolve auto knobs (gather_tiles=-1, tile_rays=0) the same way
    # make_frame_renderer will, so the manifest records the EXACT statics
    # embedded in the serialized graph — a consumer rebuilding statics via
    # statics_from_manifest gets the graph the artifact contains.
    from pronerf_tpu.render.renderer import resolve_gather_statics

    resolved_tile = H * W if (not tile_rays or tile_rays >= H * W) else tile_rays
    statics = resolve_gather_statics(statics, H, W, resolved_tile)
    renderer = make_frame_renderer(statics, H, W, K, tile_rays, unroll=unroll)
    c2w = jax.numpy.eye(3, 4)
    exported = jax_export.export(renderer)(params, scene, c2w)

    paths = expected_artifact_paths(export_dir)
    Path(export_dir).mkdir(parents=True, exist_ok=True)
    paths["executable"].write_bytes(exported.serialize())
    save_checkpoint(paths["params"], {"params": params, "scene": scene})
    paths["manifest"].write_text(
        json.dumps(
            {
                "H": H,
                "W": W,
                "K": np.asarray(K).tolist(),
                "tile_rays": tile_rays,
                "unroll": unroll,
                "compute_dtype": statics.compute_dtype or "float32",
                "statics": _statics_to_json(statics),
                "platforms": list(exported.platforms),
            },
            indent=2,
        )
    )
    return paths


def load_exported_renderer(export_dir):
    """Deserialize an exported renderer.

    Returns ``(call_fn, params, scene, manifest)``;
    ``call_fn(params, scene, c2w)`` executes the AOT graph. ``scene`` is the
    bundled reference-view scene the artifact was built with (None for
    pre-bundling artifacts).

    Accepts the export DIRECTORY or any artifact path inside it (``export``
    prints the executable path; feeding that back must work — like handing
    TensorRT the ``.trt`` file itself, ``trt_infer_v2.py:152-165``).
    """
    export_dir = Path(export_dir)
    if export_dir.suffix in {".xla", ".ckpt", ".json"} or export_dir.is_file():
        export_dir = export_dir.parent
    paths = expected_artifact_paths(export_dir)
    exported = jax_export.deserialize(paths["executable"].read_bytes())
    manifest = json.loads(paths["manifest"].read_text())
    bundle = load_checkpoint(paths["params"])
    return exported.call, bundle["params"], bundle.get("scene"), manifest
