import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import numpy as np
import jax
import tpu_rt
from tpu_rt.ops.pallas_mesh import mesh_direct_render
from tpu_rt.integrator.path import render as render_xla

scene = tpu_rt.load_file("/root/reference/scenes/simple.xml", res=512, spp=64)
img = mesh_direct_render(scene, spp=32, seed=0)
_ = np.asarray(img)
ts = []
for rep in range(3):
    t0 = time.perf_counter()
    img = mesh_direct_render(scene, spp=64, seed=rep)
    _ = np.asarray(img)
    ts.append(time.perf_counter() - t0)
dt = sorted(ts)[1]
rays = mesh_direct_render.last_ray_count
print("fused simple.xml 512^2 64spp: %.0fM rays/s (%.0f ms, mean %.4f)" % (
    rays/dt/1e6, dt*1e3, float(np.asarray(img).mean())))
