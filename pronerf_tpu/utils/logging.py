"""Observability: structured training metrics + image logging.

The reference logs to stdout only (tqdm prints; its tensorboard dep and
``i_img`` flag are vestigial — no writer is ever created, SURVEY.md §5).
Here every experiment gets a ``metrics.jsonl`` stream (one JSON object per
event, machine-readable) alongside the stdout prints, and ``i_img`` is
actually implemented: a held-out render PNG dropped under ``imgs/`` every
``i_img`` steps.
"""

from __future__ import annotations

import json
import time
from pathlib import Path


class MetricsLogger:
    def __init__(self, expdir):
        self.path = Path(expdir) / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, step: int, **scalars):
        rec = {"step": int(step), "wall_s": round(time.time() - self._t0, 3)}
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._fh.write(json.dumps(rec) + "\n")

    def close(self):
        self._fh.close()


def save_image_log(expdir, step: int, name: str, img) -> str:
    """PNG image log under ``expdir/imgs`` (the implemented ``i_img``)."""
    import numpy as np
    import imageio.v2 as imageio

    from pronerf_tpu.ops.metrics import to8b

    out = Path(expdir) / "imgs"
    out.mkdir(parents=True, exist_ok=True)
    path = out / f"{name}_{step:06d}.png"
    imageio.imwrite(path, to8b(np.asarray(img)))
    return str(path)
