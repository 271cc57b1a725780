from pronerf_tpu.render.raygen import prepare_scene, rays_for_pose, rays_from_pool
