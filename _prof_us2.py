import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import numpy as np
import jax, jax.numpy as jnp
import tpu_rt
from tpu_rt.integrator.ultrasound import simulate_acquisition
from tpu_rt.ops.pallas_us import bake_us_scene, simulate_acquisition_pallas

scene = tpu_rt.load_file("/root/reference/MitsubaScenes/Sphere_Box.xml")
BS = bake_us_scene(scene)

def bench(name, fn):
    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained(scene, reps):
        def body(c, i):
            ch, tx = fn(scene, i)
            return c + ch.sum() * 0, ch.sum()
        c, s = jax.lax.scan(body, jnp.zeros(()), jnp.arange(reps))
        return s[-1]
    out = {}
    for reps in (1, 5):
        s = chained(scene, reps); _ = float(s)
        ts = []
        for _i in range(3):
            t0 = time.perf_counter(); s = chained(scene, reps); _ = float(s)
            ts.append(time.perf_counter() - t0)
        out[reps] = sorted(ts)[1]
    per = (out[5] - out[1]) / 4
    print("%s: %.2f ms/acquisition" % (name, per*1e3))

bench("XLA    rpp=16", lambda sc, i: simulate_acquisition(sc, seed=i, rays_per_pair=16))
bench("pallas rpp=16", lambda sc, i: simulate_acquisition_pallas(sc, seed=i, rays_per_pair=16, baked=BS))
bench("XLA    rpp=64", lambda sc, i: simulate_acquisition(sc, seed=i, rays_per_pair=64))
bench("pallas rpp=64", lambda sc, i: simulate_acquisition_pallas(sc, seed=i, rays_per_pair=64, baked=BS))
