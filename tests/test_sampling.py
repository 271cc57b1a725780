import numpy as np
import jax
import jax.numpy as jnp

from pronerf_tpu.ops import (
    bin_constrain,
    explore_expand,
    gap_jitter,
    ndc_to_3d_depth,
    sort_with_payloads,
)


def test_sort_with_payloads():
    keys = jnp.asarray([[3.0, 1.0, 2.0], [0.5, 0.2, 0.9]])
    p1 = jnp.asarray([[30.0, 10.0, 20.0], [5.0, 2.0, 9.0]])
    sk, sp = sort_with_payloads(keys, p1)
    np.testing.assert_allclose(np.asarray(sk), [[1, 2, 3], [0.2, 0.5, 0.9]])
    np.testing.assert_allclose(np.asarray(sp), [[10, 20, 30], [2, 5, 9]])


def test_ndc_to_3d_depth():
    np.testing.assert_allclose(float(ndc_to_3d_depth(0.0, 1e-6)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(ndc_to_3d_depth(0.5, 1e-6)), 2.0, rtol=1e-4)


def test_bin_constrain_stays_in_bins():
    rng = np.random.default_rng(0)
    z = np.sort(rng.uniform(0, 1, size=(16, 8)), axis=-1).astype(np.float32)
    sig = rng.uniform(0, 1, size=(16, 8)).astype(np.float32)
    near, far = 0.0, 1.0
    out = np.asarray(bin_constrain(jnp.asarray(z), jnp.asarray(sig), near, far))
    mids = 0.5 * (z[:, 1:] + z[:, :-1])
    upper = np.concatenate([mids, 0.5 * (far + z[:, -1:])], -1)
    lower = np.concatenate([0.5 * (near + z[:, :1]), mids], -1)
    assert np.all(out >= lower - 1e-6) and np.all(out <= upper + 1e-6)
    # bins partition: result remains sorted
    assert np.all(np.diff(out, axis=-1) >= -1e-6)


def _explore_reference(z, n_mult, up, near, far):
    """NumPy re-derivation of the reference exploration layout
    (run_S_eS_eN_alter_base.py:689-710): sample-major shifted copies."""
    N, S = z.shape
    if n_mult == 1:
        return z
    mults = np.arange(n_mult) / n_mult
    if up:
        nxt = np.concatenate([z[:, 1:], np.full((N, 1), far)], 1)
        diff = np.abs(z - nxt)
        out = z[:, :, None] + mults[None, None, :] * diff[:, :, None]
    else:
        prv = np.concatenate([np.full((N, 1), near), z[:, :-1]], 1)
        diff = np.abs(z - prv)
        out = z[:, :, None] - mults[None, None, :] * diff[:, :, None]
    return np.sort(out.reshape(N, S * n_mult), axis=-1)


def test_explore_expand_matches_reference_layout():
    rng = np.random.default_rng(1)
    near, far = 0.0, 1.0
    z = np.sort(rng.uniform(0.05, 0.95, size=(7, 8)), -1).astype(np.float32)
    for n_mult in (1, 2, 4, 8):
        for up in (True, False):
            z64, nv = explore_expand(
                jnp.asarray(z), jnp.int32(n_mult), jnp.asarray(up), near, far
            )
            z64 = np.asarray(z64)
            assert int(nv) == 8 * n_mult
            expect = _explore_reference(z, n_mult, up, near, far)
            np.testing.assert_allclose(z64[:, : 8 * n_mult], expect, atol=1e-6)
            # padding slots parked at far
            assert np.all(z64[:, 8 * n_mult:] == far)


def test_gap_jitter_preserves_order_and_bounds():
    rng = np.random.default_rng(2)
    near, far = 0.0, 1.0
    z = np.sort(rng.uniform(0.05, 0.95, size=(32, 8)), -1).astype(np.float32)
    for up in (True, False):
        out = np.asarray(
            gap_jitter(
                jax.random.PRNGKey(0), jnp.asarray(z), near, far,
                jnp.asarray(up), 0.99,
            )
        )
        assert np.all(np.diff(out, axis=-1) >= -1e-6)
        assert np.all(out >= near - 1e-6) and np.all(out <= far + 1e-6)
        if up:
            assert np.all(out >= z - 1e-7)
        else:
            assert np.all(out <= z + 1e-7)


def test_sample_pdf_concentrates_on_heavy_bins():
    from pronerf_tpu.ops.sampling import sample_pdf

    n = 64
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (n, 9))
    w = jnp.zeros((n, 8)).at[:, 3].set(10.0)  # all mass in bin [0.375, 0.5]
    s = np.asarray(sample_pdf(jax.random.PRNGKey(0), bins, w, 16))
    assert s.shape == (n, 16)
    frac_in = np.mean((s >= 0.375 - 1e-3) & (s <= 0.5 + 1e-3))
    assert frac_in > 0.95
    # deterministic variant spans the CDF monotonically
    sd = np.asarray(sample_pdf(jax.random.PRNGKey(0), bins, w, 16, det=True))
    assert np.all(np.diff(sd, axis=-1) >= -1e-6)
