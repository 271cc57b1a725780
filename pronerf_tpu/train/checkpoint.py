"""Checkpointing: msgpack pytree snapshots with the reference's logical key
layout so tooling parity holds (SURVEY.md §5):

- stage 1 saves {global_step, network_fn, mmr_network_fn, refine_net,
  optimizer, s_optimizer} every ``i_weights`` steps to
  ``basedir/expname/%06d.ckpt``;
- stage 2 additionally saves network_fine (the trained NeRF) and
  optimizer_nerf;
- auto-resume picks the lexicographically last checkpoint in the expdir
  unless --no_reload; --ft_path / --pretrain_path pin explicit files.

The on-disk format is flax msgpack over numpy-ified pytrees (structure
restored against a freshly-initialized target), replacing torch.save dicts.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import numpy as np
from flax import serialization

CKPT_SUFFIX = ".ckpt"


def save_checkpoint(path, state) -> str:
    """Serialize a pytree ``state`` to ``path`` (msgpack)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # to_state_dict flattens optax namedtuple states into plain dicts.
    host_state = jax.tree_util.tree_map(
        np.asarray, serialization.to_state_dict(state)
    )
    data = serialization.msgpack_serialize(host_state)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(data)
    os.replace(tmp, path)
    return str(path)


def load_checkpoint(path, target=None, raw: bool = False):
    """Restore a pytree from ``path``. With ``target`` the stored leaves are
    mapped onto the target structure (shape-checked); without, the
    dict-of-arrays is returned (state-dict form when ``raw``, with integer-
    keyed dicts converted back to lists otherwise)."""
    data = Path(path).read_bytes()
    restored = serialization.msgpack_restore(data)
    if target is not None:
        return serialization.from_state_dict(target, restored)
    return restored if raw else _relistify(restored)


def _relistify(tree):
    """Undo to_state_dict's list->{'0': ...} conversion on raw loads."""
    if isinstance(tree, dict):
        out = {k: _relistify(v) for k, v in tree.items()}
        if out and all(
            isinstance(k, str) and k.isdigit() for k in out
        ):
            idx = sorted(out, key=int)
            if [int(k) for k in idx] == list(range(len(idx))):
                return [out[k] for k in idx]
        return out
    return tree


def latest_checkpoint(expdir) -> str | None:
    """Newest checkpoint in an experiment dir (auto-resume semantics)."""
    expdir = Path(expdir)
    if not expdir.is_dir():
        return None
    ckpts = sorted(
        f for f in os.listdir(expdir) if f.endswith(CKPT_SUFFIX)
    )
    return str(expdir / ckpts[-1]) if ckpts else None


def checkpoint_path(expdir, step: int) -> str:
    return str(Path(expdir) / f"{step:06d}{CKPT_SUFFIX}")
