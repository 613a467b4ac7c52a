"""Bunny global-illumination A/B: divergent-ray coherence sort on/off.

The hybrid mesh path (XLA path tracer + Pallas cluster kernel per bounce)
is corridor-bound on multi-segment meshes: cosine-hemisphere bounce rays
scatter every (tm, 128) ray block over the sphere, so each block sweeps
most live clusters.  trace.gi_sort_order stably groups rays by (origin
cell, direction octant) around each intersect call (integrator/path.py
_intersect/_shadow_test).  This tool times the FULL bunny GI render both
ways on the real TPU.

MEASURED (r5, v5e): nosort 961 ms [951..961], sort 1076 ms [1070..1085]
at 256^2 spp16 d3, mean radiance IDENTICAL (1.38068) — the sort is a
measured dead end (argsort + gathers cost more than the cull savings);
default is now OFF (TPU_RT_GI_SORT=1 re-enables).

Usage: python tools/bench_gi_sort.py [sort|nosort|both]
Env: GI_RES (256), GI_SPP (16), GI_DEPTH (3), GI_REPS (3).
"""

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")


def make_scene(res, depth):
    import numpy as np

    import tpu_rt

    T = tpu_rt.ScalarTransform4f
    return tpu_rt.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": depth},
        "sensor": {
            "type": "perspective", "fov": 40,
            "to_world": T().look_at(origin=[0, 0.12, 0.35],
                                    target=[0, 0.1, 0], up=[0, 1, 0]),
            "film": {"type": "hdrfilm", "width": res, "height": res,
                     "rfilter": {"type": "box"}},
        },
        "bunny": {"type": "ply",
                  "filename": "/root/reference/scenes/meshes/bunny.ply",
                  "bsdf": {"type": "diffuse",
                           "reflectance": 0.6 * np.ones(3)}},
        "floor": {
            "type": "rectangle",
            "to_world": T().translate([0, 0.03, 0])
            @ T().rotate([1, 0, 0], -90) @ T().scale([0.6, 0.6, 1]),
            "bsdf": {"type": "diffuse", "reflectance": 0.5 * np.ones(3)},
        },
        "light": {
            "type": "rectangle",
            "to_world": T().translate([0, 0.5, 0])
            @ T().rotate([1, 0, 0], 90) @ T().scale([0.2, 0.2, 1]),
            "emitter": {"type": "area", "radiance": 40.0 * np.ones(3)},
        },
    })


def run_one(label):
    import jax
    import numpy as np

    import tpu_rt

    res = int(os.environ.get("GI_RES", "256"))
    spp = int(os.environ.get("GI_SPP", "16"))
    depth = int(os.environ.get("GI_DEPTH", "3"))
    reps = int(os.environ.get("GI_REPS", "3"))
    scene = make_scene(res, depth)
    from tpu_rt.ops import pallas_path as pp

    assert pp.bake_scene(scene) is None, "bunny must be on the hybrid path"

    t0 = time.perf_counter()
    img = tpu_rt.render(scene, spp=spp, seed=0)
    jax.block_until_ready(img)
    compile_s = time.perf_counter() - t0
    assert np.isfinite(np.asarray(img)).all()
    mean = float(np.asarray(img).mean())

    ts = []
    for s in range(1, reps + 1):
        t0 = time.perf_counter()
        jax.block_until_ready(tpu_rt.render(scene, spp=spp, seed=s))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    from tpu_rt.integrator.path import render as render_path

    n_rays = int(render_path.last_ray_count)
    print(json.dumps({
        "metric": "bunny_gi_render_s", "label": label,
        "value": round(med, 4), "lo": round(ts[0], 4),
        "hi": round(ts[-1], 4), "n": reps,
        "config": f"{res}^2 spp{spp} d{depth}",
        "mean_radiance": round(mean, 5),
        "mrays_per_s": round(n_rays / med / 1e6, 1),
        "compile_s": round(compile_s, 1),
    }), flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which == "both":
        for mode, env in (("nosort", "0"), ("sort", "1")):
            e = dict(os.environ, TPU_RT_GI_SORT=env)
            subprocess.run([sys.executable, __file__, mode], env=e,
                           check=True)
        return
    os.environ.setdefault("TPU_RT_GI_SORT",
                          "1" if which == "sort" else "0")
    run_one(which)


if __name__ == "__main__":
    main()
