"""Mesh GI through ONE megakernel vs the hybrid XLA<->Pallas path
(VERDICT r3 #6 "done" gate: >= 3x the hybrid's throughput on a
teapot-class path-integrator scene, bias-gated vs the XLA tracer).

Scene: teapot + floor + area light, path integrator.  Run on the real
TPU.  Env: GI_RES (default 256), GI_SPP (64), GI_DEPTH (3).
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import numpy as np

import tpu_rt
from tpu_rt.integrator.path import render as render_xla
from tpu_rt.ops import pallas_path as pp


def make_scene(res, depth):
    return tpu_rt.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": depth},
        "sensor": {
            "type": "perspective", "fov": 40,
            "to_world": tpu_rt.ScalarTransform4f().look_at(
                origin=[0, 1.5, 5], target=[0, 0.5, 0], up=[0, 1, 0]),
            "film": {"type": "hdrfilm", "width": res, "height": res,
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


def timed(fn, reps=5):
    out = fn(0)
    jax.block_until_ready(out)
    ts = []
    for s in range(1, reps + 1):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(s))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], ts[0], ts[-1]


def main():
    res = int(os.environ.get("GI_RES", "256"))
    spp = int(os.environ.get("GI_SPP", "64"))
    depth = int(os.environ.get("GI_DEPTH", "3"))
    scene = make_scene(res, depth)
    bs = pp.bake_scene(scene)
    assert bs is not None and bs.mesh is not None
    print(f"{res}^2 spp {spp} depth {depth}; "
          f"{bs.mesh['n_clusters']} clusters", flush=True)

    t0 = time.perf_counter()
    med_k, lo_k, hi_k = timed(
        lambda s: pp.render_pallas(scene, spp=spp, seed=s, baked=bs))
    print(f"megakernel: median {med_k*1e3:.1f} ms "
          f"[{lo_k*1e3:.1f}..{hi_k*1e3:.1f}] "
          f"(incl. first-call compile {time.perf_counter()-t0:.0f} s)",
          flush=True)

    med_h, lo_h, hi_h = timed(
        lambda s: render_xla(scene, spp=spp, seed=s), reps=3)
    print(f"hybrid XLA<->Pallas: median {med_h*1e3:.1f} ms "
          f"[{lo_h*1e3:.1f}..{hi_h*1e3:.1f}]", flush=True)
    print(f"speedup {med_h/med_k:.2f}x", flush=True)

    # bias gate: mean agreement
    ik = np.asarray(pp.render_pallas(scene, spp=spp, seed=99, baked=bs))
    ix = np.asarray(render_xla(scene, spp=spp, seed=99))
    rel = abs(ik.mean() - ix.mean()) / ix.mean()
    print(f"mean kernel {ik.mean():.5f} xla {ix.mean():.5f} rel {rel:.3%}",
          flush=True)


if __name__ == "__main__":
    main()
