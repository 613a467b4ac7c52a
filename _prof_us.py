import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import numpy as np
import jax, jax.numpy as jnp
import tpu_rt
from tpu_rt.integrator.ultrasound import simulate_acquisition

import tpu_rt.compat  # USMain dict path
scene = tpu_rt.load_file("/root/reference/MitsubaScenes/Sphere_Box.xml")

@functools.partial(jax.jit, static_argnames=("reps","rpp"))
def chained(scene, reps, rpp):
    def body(c, i):
        ch, tx = simulate_acquisition(scene, seed=i, rays_per_pair=rpp)
        return c + ch.sum() * 0, ch.sum()
    c, s = jax.lax.scan(body, jnp.zeros(()), jnp.arange(reps))
    return s[-1]

for rpp in (1, 16, 64):
    out = {}
    for reps in (1, 5):
        s = chained(scene, reps, rpp); _ = float(s)
        ts = []
        for _i in range(3):
            t0 = time.perf_counter(); s = chained(scene, reps, rpp); _ = float(s)
            ts.append(time.perf_counter() - t0)
        out[reps] = sorted(ts)[1]
    per = (out[5] - out[1]) / 4
    print("rays_per_pair=%3d: %.2f ms/acquisition" % (rpp, per*1e3))
