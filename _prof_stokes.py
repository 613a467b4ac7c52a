import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import numpy as np
import jax
import tpu_rt
from tpu_rt.integrator.stokes import render_stokes

scene = tpu_rt.load_file("/root/reference/scenes/cbox_pol.xml", res=256, spp=1)
img = render_stokes(scene, spp=32, seed=0)   # warmup/compile
_ = np.asarray(img)
ts = []
for rep in range(3):
    t0 = time.perf_counter()
    img = render_stokes(scene, spp=512, seed=rep)
    _ = np.asarray(img)
    ts.append(time.perf_counter() - t0)
dt = sorted(ts)[1]
n_samples = 256 * 256 * 512
print("cbox_pol 256^2 512spp: %.2f s = %.1fM samples/s (Stokes 4x3 output)" % (dt, n_samples/dt/1e6))
print("S0 mean %.4f; Q/U nonzero: %s" % (float(np.asarray(img)[...,0,:].mean()),
      bool(np.abs(np.asarray(img)[...,1:3,:]).max() > 1e-4)))
