"""AOT export of the inference renderer — the TPU-native replacement for
ONNX -> TensorRT engine building (``onnx2trt.py:7-55``,
``run_S_eS_eN_alter_trt.py:377-409``).

Instead of exporting the three MLPs separately and re-stitching them with
device buffers at runtime, the WHOLE frame pipeline (sampler -> warp ->
refine -> NeRF -> compositing, tiled) is lowered once via ``jax.export``
into a serialized StableHLO executable, bundled with msgpack'd params and a
JSON manifest. ``expected_artifact_paths`` mirrors
``pronerf/tensorrt.py:8-14`` for CLI surface parity.
"""

from __future__ import annotations

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


def export_renderer(
    params,
    scene,
    export_dir,
    H: int,
    W: int,
    K,
    tile_rays: int = 8192,
    compute_dtype=None,
):
    """Lower + serialize the frame renderer for (H, W) and save params."""
    statics = RenderStatics.infer(compute_dtype=compute_dtype)
    renderer = make_frame_renderer(statics, H, W, K, tile_rays)
    c2w = jax.numpy.eye(3, 4)
    exported = jax_export.export(renderer)(params, scene, c2w)

    paths = expected_artifact_paths(export_dir)
    Path(export_dir).mkdir(parents=True, exist_ok=True)
    paths["executable"].write_bytes(exported.serialize())
    save_checkpoint(paths["params"], {"params": params})
    paths["manifest"].write_text(
        json.dumps(
            {
                "H": H,
                "W": W,
                "K": np.asarray(K).tolist(),
                "tile_rays": tile_rays,
                "compute_dtype": compute_dtype or "float32",
                "platforms": list(exported.platforms),
            },
            indent=2,
        )
    )
    return paths


def load_exported_renderer(export_dir):
    """Deserialize an exported renderer; returns (call_fn, params, manifest).

    ``call_fn(params, scene, c2w)`` executes the AOT graph.
    """
    paths = expected_artifact_paths(export_dir)
    exported = jax_export.deserialize(paths["executable"].read_bytes())
    manifest = json.loads(paths["manifest"].read_text())
    params = load_checkpoint(paths["params"])["params"]
    return exported.call, params, manifest
