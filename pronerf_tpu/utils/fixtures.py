"""On-disk LLFF dataset fixtures (poses_bounds.npy + images/ + COLMAP
sparse model) — the inverse of our loaders, shared by the test suite and the
``scripts/verify_fern.py`` CI-style protocol run.

The written layout mirrors a real LLFF capture directory
(``/root/reference/load_llff.py:246-264`` read side): ``poses_bounds.npy``
rows are the flattened 3x5 [stored_pose | hwf] plus [near, far], images live
under ``images/``, and the COLMAP binary model under ``sparse/0``.
"""

from __future__ import annotations

import struct

import numpy as np


def write_llff_dataset(root, n: int = 6, H: int = 24, W: int = 32,
                       focal: float = 30.0):
    """Write a minimal on-disk LLFF dataset (poses_bounds.npy + images/)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    (root / "images").mkdir(parents=True)
    rows = []
    for i in range(n):
        # c2w with identity-ish rotation; store with LLFF's [down, right,
        # back] column convention (inverse of the loader's [-y, x, z] remap).
        c2w = np.concatenate(
            [np.eye(3), np.array([[0.1 * i], [0.05 * i], [0.0]])], 1
        )
        stored = np.concatenate(
            [-c2w[:, 1:2], c2w[:, 0:1], c2w[:, 2:]], 1
        )  # invert row remap
        m = np.concatenate([stored, np.array([[H], [W], [focal]])], 1)
        rows.append(np.concatenate([m.flatten(), [1.0, 10.0]]))
        img = (rng.uniform(0, 255, size=(H, W, 3))).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"img_{i:03d}.png")
    np.save(root / "poses_bounds.npy", np.stack(rows))


def write_colmap_model(root, n_images: int = 6, n_points: int = 40):
    """Write minimal images.bin / points3D.bin (inverse of our readers)."""
    sparse = root / "sparse/0"
    sparse.mkdir(parents=True)
    rng = np.random.default_rng(1)
    with open(sparse / "images.bin", "wb") as fh:
        fh.write(struct.pack("<Q", n_images))
        for i in range(n_images):
            fh.write(struct.pack("<i", i + 1))
            fh.write(struct.pack("<4d", 1, 0, 0, 0))
            fh.write(struct.pack("<3d", 0, 0, 0))
            fh.write(struct.pack("<i", 1))
            fh.write(f"img_{i:03d}.png".encode() + b"\x00")
            fh.write(struct.pack("<Q", 0))
    # view v sees points [0 .. 5*(v+1)) -> later views see more
    tracks = {p: [] for p in range(n_points)}
    for v in range(n_images):
        for p in range(min(5 * (v + 1), n_points)):
            tracks[p].append(v + 1)
    with open(sparse / "points3D.bin", "wb") as fh:
        fh.write(struct.pack("<Q", n_points))
        for p in range(n_points):
            fh.write(struct.pack("<Q", p + 1))
            fh.write(struct.pack("<3d", *rng.normal(size=3)))
            fh.write(struct.pack("<3B", 128, 128, 128))
            fh.write(struct.pack("<d", 0.5))
            ims = tracks[p]
            fh.write(struct.pack("<Q", len(ims)))
            for im in ims:
                fh.write(struct.pack("<2i", im, 0))
