import numpy as np
import jax.numpy as jnp

from pronerf_tpu.ops.composite import composite


def _composite_np(raw, z, rays_d, noise=None, mm_add=None, mm_mul=None,
                  clamp=False):
    """Straight-line NumPy re-derivation of the reference raw2outputs."""
    if clamp:
        raw = np.clip(raw, -10, 10)
    rgb = 1 / (1 + np.exp(-raw[..., :3]))
    dists = np.concatenate(
        [z[:, 1:] - z[:, :-1], np.full_like(z[:, :1], 1e10)], -1
    )
    dists = dists * np.linalg.norm(rays_d, axis=-1, keepdims=True)
    a = raw[..., 3]
    if noise is not None:
        a = a + noise
    if mm_add is not None:
        a = a + mm_add
    alpha = 1 - np.exp(-np.maximum(a, 0) * dists)
    if mm_mul is not None:
        alpha = alpha * np.maximum(mm_mul, 0)
    trans = np.cumprod(
        np.concatenate([np.ones_like(alpha[:, :1]), 1 - alpha + 1e-10], -1), -1
    )[:, :-1]
    w = alpha * trans
    return {
        "rgb": (w[..., None] * rgb).sum(-2),
        "depth": (w * z).sum(-1),
        "acc": w.sum(-1),
        "weights": w,
    }


def _random_inputs(N=16, S=8, seed=0):
    rng = np.random.default_rng(seed)
    raw = rng.normal(0, 3, size=(N, S, 4)).astype(np.float32)
    z = np.sort(rng.uniform(0, 1, size=(N, S)), -1).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    return raw, z, d, rng


def test_composite_matches_numpy_reference():
    raw, z, d, rng = _random_inputs()
    out = composite(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d))
    exp = _composite_np(raw, z, d)
    for k in ("rgb", "depth", "acc", "weights"):
        np.testing.assert_allclose(np.asarray(out[k]), exp[k], atol=1e-5)


def test_composite_mm_terms_and_clamp():
    raw, z, d, rng = _random_inputs(seed=1)
    raw *= 5  # exercise the clamp
    add = rng.normal(size=z.shape).astype(np.float32)
    mul = rng.normal(size=z.shape).astype(np.float32)
    out = composite(
        jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d),
        mm_add=jnp.asarray(add), mm_mul=jnp.asarray(mul), clamp_raw=True,
    )
    exp = _composite_np(raw, z, d, mm_add=add, mm_mul=mul, clamp=True)
    np.testing.assert_allclose(np.asarray(out["rgb"]), exp["rgb"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]), exp["depth"], atol=1e-4)


def test_composite_num_valid_equals_slicing():
    """Masked 64-slot compositing must equal compositing the valid prefix."""
    rng = np.random.default_rng(2)
    N, S, nv = 8, 64, 24
    raw = rng.normal(0, 2, size=(N, S, 4)).astype(np.float32)
    z = np.sort(rng.uniform(0, 1, size=(N, S)), -1).astype(np.float32)
    z[:, nv:] = 1.0  # padding parked at far
    d = rng.normal(size=(N, 3)).astype(np.float32)
    masked = composite(
        jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d),
        num_valid=jnp.int32(nv),
    )
    sliced = composite(
        jnp.asarray(raw[:, :nv]), jnp.asarray(z[:, :nv]), jnp.asarray(d)
    )
    np.testing.assert_allclose(
        np.asarray(masked["rgb"]), np.asarray(sliced["rgb"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(masked["depth"]), np.asarray(sliced["depth"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(masked["acc"]), np.asarray(sliced["acc"]), atol=1e-5
    )


def test_composite_white_background():
    raw, z, d, _ = _random_inputs(seed=3)
    raw[..., 3] = -100.0  # zero density -> rgb must be pure white
    out = composite(
        jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d), white_bkgd=True
    )
    np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-5)
