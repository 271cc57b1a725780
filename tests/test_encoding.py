import numpy as np
import jax.numpy as jnp

from pronerf_tpu.ops import positional_encoding, posenc_dim, plucker


def test_posenc_layout_and_dim():
    x = np.array([[0.3, -0.5, 0.9]], np.float32)
    L = 4
    out = np.asarray(positional_encoding(jnp.asarray(x), L))
    assert out.shape == (1, posenc_dim(3, L)) == (1, 27)
    # Layout: [x, sin(2^0 x), cos(2^0 x), ..., sin(2^{L-1} x), cos(2^{L-1} x)].
    expect = [x[0]]
    for k in range(L):
        expect.append(np.sin(x[0] * 2.0**k))
        expect.append(np.cos(x[0] * 2.0**k))
    np.testing.assert_allclose(out[0], np.concatenate(expect), atol=1e-6)


def test_posenc_dims_match_reference_operating_point():
    assert posenc_dim(3, 10) == 63  # xyz embedding
    assert posenc_dim(3, 4) == 27   # viewdir embedding


def test_plucker_normalizes_direction():
    p = np.array([[1.0, 2.0, 3.0]], np.float32)
    d = np.array([[0.0, 0.0, -2.0]], np.float32)
    out = np.asarray(plucker(jnp.asarray(p), jnp.asarray(d)))
    assert out.shape == (1, 6)
    np.testing.assert_allclose(out[0, :3], [0, 0, -1], atol=1e-6)
    # m = p x d_hat
    np.testing.assert_allclose(
        out[0, 3:], np.cross(p[0], [0, 0, -1.0]), atol=1e-6
    )


def test_plucker_invariant_along_ray():
    # The moment p x d_hat is invariant to sliding p along the ray.
    rng = np.random.default_rng(0)
    o = rng.normal(size=(10, 3)).astype(np.float32)
    d = rng.normal(size=(10, 3)).astype(np.float32)
    p2 = o + 1.7 * d
    e1 = np.asarray(plucker(jnp.asarray(o), jnp.asarray(d)))
    e2 = np.asarray(plucker(jnp.asarray(p2), jnp.asarray(d)))
    np.testing.assert_allclose(e1, e2, atol=1e-5)


def test_plucker_broadcast_over_samples():
    o = np.zeros((4, 6, 3), np.float32)
    d = np.ones((4, 1, 3), np.float32)
    out = plucker(jnp.asarray(o), jnp.asarray(d))
    assert out.shape == (4, 6, 6)
