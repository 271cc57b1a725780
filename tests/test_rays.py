import numpy as np
import jax.numpy as jnp

from pronerf_tpu.ops import get_rays, get_rays_np, ndc_rays, ray_points


def _camera():
    H, W, focal = 12, 16, 20.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    theta = 0.1
    R = np.array(
        [
            [np.cos(theta), 0, np.sin(theta)],
            [0, 1, 0],
            [-np.sin(theta), 0, np.cos(theta)],
        ],
        np.float32,
    )
    t = np.array([0.3, -0.2, 0.5], np.float32)
    c2w = np.concatenate([R, t[:, None]], 1)
    return H, W, K, c2w


def test_get_rays_pixel_convention():
    H, W, K, c2w = _camera()
    rays_o, rays_d = get_rays(H, W, K, c2w)
    assert rays_o.shape == (H, W, 3) and rays_d.shape == (H, W, 3)
    # Origins are the camera center everywhere.
    np.testing.assert_allclose(np.asarray(rays_o[3, 5]), c2w[:3, 3], rtol=1e-6)
    # Pixel (j=cy, i=cx) must look straight down the camera -z axis.
    i, j = int(K[0, 2]), int(K[1, 2])
    expected = c2w[:3, :3] @ np.array([0.0, 0.0, -1.0])
    np.testing.assert_allclose(np.asarray(rays_d[j, i]), expected, atol=1e-5)
    # One pixel right adds +1/f along camera x; one pixel down adds -1/f
    # along camera y (OpenGL-style y-up image convention).
    dx = np.asarray(rays_d[j, i + 1] - rays_d[j, i])
    np.testing.assert_allclose(dx, c2w[:3, :3] @ np.array([1 / K[0, 0], 0, 0]), atol=1e-5)
    dy = np.asarray(rays_d[j + 1, i] - rays_d[j, i])
    np.testing.assert_allclose(dy, c2w[:3, :3] @ np.array([0, -1 / K[1, 1], 0]), atol=1e-5)


def test_get_rays_np_matches_jax():
    H, W, K, c2w = _camera()
    ro_j, rd_j = get_rays(H, W, K, c2w)
    ro_n, rd_n = get_rays_np(H, W, K, c2w)
    np.testing.assert_allclose(np.asarray(ro_j), ro_n, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rd_j), rd_n, rtol=1e-5)


def test_ndc_rays_origin_on_near_plane():
    H, W, K, c2w = _camera()
    # Forward-facing camera: identity rotation so rays have dz < 0.
    c2w = np.concatenate([np.eye(3, dtype=np.float32), c2w[:, 3:]], 1)
    rays_o, rays_d = get_rays(H, W, K, c2w)
    near = 1.0
    ndc_o, ndc_d = ndc_rays(H, W, float(K[0, 0]), near, rays_o, rays_d)
    # The NDC z of the shifted origin is 1 + 2 * near / z where z == -near,
    # i.e. exactly -1 for every ray.
    np.testing.assert_allclose(np.asarray(ndc_o[..., 2]), -1.0, atol=1e-5)
    # o + d lands at the far plane z == +1 (t=1 maps to infinity).
    np.testing.assert_allclose(
        np.asarray(ndc_o[..., 2] + ndc_d[..., 2]), 1.0, atol=1e-5
    )


def test_ndc_projection_formula():
    H, W, K, c2w = _camera()
    c2w = np.concatenate([np.eye(3, dtype=np.float32), c2w[:, 3:]], 1)
    rays_o, rays_d = get_rays(H, W, K, c2w)
    near = 1.0
    ndc_o, ndc_d = ndc_rays(H, W, float(K[0, 0]), near, rays_o, rays_d)
    # Independent check: project the world-space point at parameter t' along
    # each ray with the pinhole NDC projection and confirm it equals
    # ndc_o + t * ndc_d for the corresponding NDC t.
    rays_o = np.asarray(rays_o).reshape(-1, 3)
    rays_d = np.asarray(rays_d).reshape(-1, 3)
    ndc_o = np.asarray(ndc_o).reshape(-1, 3)
    ndc_d = np.asarray(ndc_d).reshape(-1, 3)
    focal = float(K[0, 0])
    for t_ndc in (0.0, 0.3, 0.9):
        # world point: origin shifted to near plane, then marched so that
        # ndc-z equals the projection of its world z.
        shift = -(near + rays_o[:, 2]) / rays_d[:, 2]
        o_n = rays_o + shift[:, None] * rays_d
        # Solve for world t such that projecting gives ndc z = -1 + t*dz...
        p_ndc = ndc_o + t_ndc * ndc_d
        # invert: ndc z = 1 + 2n/z  =>  z = 2n / (ndc_z - 1)
        z_w = 2 * near / (p_ndc[:, 2] - 1)
        t_w = (z_w - o_n[:, 2]) / rays_d[:, 2]
        p_w = o_n + t_w[:, None] * rays_d
        x_expect = -focal / (W / 2) * p_w[:, 0] / p_w[:, 2]
        y_expect = -focal / (H / 2) * p_w[:, 1] / p_w[:, 2]
        np.testing.assert_allclose(p_ndc[:, 0], x_expect, atol=1e-4)
        np.testing.assert_allclose(p_ndc[:, 1], y_expect, atol=1e-4)


def test_ray_points_shape():
    o = jnp.zeros((5, 3))
    d = jnp.ones((5, 3))
    z = jnp.linspace(0, 1, 7)[None, :].repeat(5, 0)
    pts = ray_points(o, d, z)
    assert pts.shape == (5, 7, 3)
    np.testing.assert_allclose(np.asarray(pts[:, 3, 0]), np.asarray(z[:, 3]))
