"""All-reference-scenes benchmark through the PUBLIC tpu_rt.render path.

Renders every scene in /root/reference/scenes at its XML-native
resolution/spp (the config `mi.render` would run — SURVEY §2e) on the real
TPU, median-of-3 wall time after one warm-up render.  Prints one line per
scene plus a JSON tail for PARITY.md.

Shadow_art has no spp default in the XML; Mitsuba's sampler default (4) is
tiny, so we quote 64 spp alongside the native-config entries (noted).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

SCENES = [
    # (file, load kwargs, spp override or None -> XML/sampler default)
    ("cbox.xml", {}, None),            # 256^2, 128 spp
    ("cbox_pol.xml", {}, None),        # 256^2, 512 spp, full Stokes
    ("polarizers.xml", {}, None),      # 128^2, 10 spp
    ("simple.xml", {}, None),          # 256^2, 256 spp
    ("shadow_art.xml", {}, 64),        # 256x128, no XML spp -> 64
]


def main():
    import jax

    import tpu_rt

    results = []
    for name, kwargs, spp in SCENES:
        path = f"/root/reference/scenes/{name}"
        scene = tpu_rt.load_file(path, **kwargs)
        use_spp = spp if spp is not None else (scene.camera.spp or 4)
        img = tpu_rt.render(scene, spp=use_spp, seed=123)
        jax.block_until_ready(img)
        times = []
        for rep in range(3):
            t0 = time.perf_counter()
            img = tpu_rt.render(scene, spp=use_spp, seed=rep)
            jax.block_until_ready(img)
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[1]
        H, W = scene.camera.height, scene.camera.width
        samples = H * W * use_spp
        print(f"{name:18s} {W}x{H} {use_spp:4d} spp: {dt*1e3:9.2f} ms "
              f"({samples/dt/1e6:8.1f}M samples/s)", flush=True)
        results.append({"scene": name, "res": [W, H], "spp": use_spp,
                        "median_s": round(dt, 5),
                        "msamples_per_s": round(samples / dt / 1e6, 1)})
    print(json.dumps(results))


if __name__ == "__main__":
    main()
