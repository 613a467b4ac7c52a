"""DAS tiling/precision sweep on the real TPU (USMain-sized problem).

The matmul-form DAS (tpu_rt/us/beamform.py::das_beamform_matmul) spends its
time CONSTRUCTING the per-(angle, element) hat-weight tensor — O(P * window)
VPU ops — not in the MXU contraction, so the window size (which scales with
the pixel tile's delay spread ~ tz*dz + tx*dx) is the lever.  This sweeps
tile shapes and einsum precisions at the reference USMain acquisition
config (/root/reference/USMain.py:26-42: 5 angles, 64 elements, 10k samples
at 50 MHz / 5 MHz / 1540 m/s; lambda/4 grid over x in [-4,4] cm, z in
[0.1,50] mm -> 1040 x 650 = 676k pixels) and checks each variant against
the gather-form reference.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_das.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import numpy as np

from tpu_rt.us.beamform import das_beamform, das_beamform_matmul, grid_scan

FS, F0, C = 50e6, 5e6, 1540.0
A, E, T = 5, 64, 10000


def main():
    rng = np.random.default_rng(0)
    # Band-limited synthetic RF: white noise convolved with a 5 MHz pulse
    # so the interpolation error check is representative.
    t = np.arange(64) / FS
    pulse = np.sin(2 * np.pi * F0 * t) * np.exp(-0.5 * ((t - t[32]) / (t[8])) ** 2)
    ch = rng.standard_normal((A, E, T)).astype(np.float32)
    ch = np.apply_along_axis(lambda x: np.convolve(x, pulse, "same"), 2, ch)
    ch = jax.device_put(ch.astype(np.float32))
    elem_x = jax.device_put(
        (np.arange(E, dtype=np.float32) - (E - 1) / 2) * 0.00012
    )
    angles = np.linspace(-15, 15, A).astype(np.float32)
    step = C / F0 / 4.0
    xg, zg = grid_scan(-0.04, 0.04, 0.001, 0.05, step, step)
    print(f"grid {xg.shape[0]} x {zg.shape[0]} = {xg.shape[0]*zg.shape[0]} px",
          flush=True)

    ref = None

    def run(label, fn):
        nonlocal ref
        f = jax.jit(fn)
        out = jax.block_until_ready(f(ch))  # compile + warm
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(ch))
            times.append(time.perf_counter() - t0)
        ms = sorted(times)[2] * 1e3
        o = np.asarray(out)
        if ref is None:
            ref = o
            rel = 0.0
        else:
            rel = float(np.sqrt(((o - ref) ** 2).mean()) /
                        max(np.sqrt((ref ** 2).mean()), 1e-30))
        print(f"{label:42s} {ms:8.1f} ms   rel-rmse vs gather {rel:.2e}",
              flush=True)

    do_sweep = os.environ.get("DIAG_DAS_SWEEP", "1") == "1"
    do_slope = os.environ.get("DIAG_DAS_SLOPE", "1") == "1"

    if do_sweep:
        run("gather (reference form)",
            lambda d: das_beamform(d, angles, elem_x, FS, C, xg, zg))

    P = jax.lax.Precision
    for (tx, tz, prec, tag) in ([] if not do_sweep else [
        (4, 4, P.HIGHEST, "4x4"),
        (8, 4, P.HIGHEST, "8x4"),
        (8, 8, P.HIGHEST, "8x8"),
        (16, 8, P.HIGHEST, "16x8"),
        (16, 16, P.HIGHEST, "16x16"),
        (8, 64, P.HIGHEST, "8x64 (legacy r3 block)"),
        (64, 64, P.HIGHEST, "64x64 (r3 default)"),
    ]):
        run(f"matmul {tag}",
            lambda d, tx=tx, tz=tz, prec=prec: das_beamform_matmul(
                d, angles, elem_x, FS, C, xg, zg, tx=tx, tz=tz,
                precision=prec))

    if not do_slope:
        return

    # ---- dispatch-vs-kernel slope on the default config -------------------
    # Chained-scan timing (CLAUDE.md r2 facts): scan the beamformer N times
    # with a data dependency; slope = (t_N - t_1)/(N-1) is the pure kernel
    # cost, intercept ~= the tunnel's per-dispatch overhead.
    def chained(n):
        def fn(d):
            def body(c, _):
                out = das_beamform_matmul(c, angles, elem_x, FS, C, xg, zg)
                # scalar data dependency feeds the next iteration
                return c + 0.0 * out.sum(), None
            c, _ = jax.lax.scan(body, d, None, length=n)
            return c
        f = jax.jit(fn)
        jax.block_until_ready(f(ch))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(ch))
            times.append(time.perf_counter() - t0)
        return sorted(times)[2]

    t1, t5 = chained(1), chained(5)
    slope = (t5 - t1) / 4.0
    print(f"default-config slope: t1 {t1*1e3:.1f} ms  t5 {t5*1e3:.1f} ms  "
          f"kernel {slope*1e3:.1f} ms/iter  dispatch ~{(t1-slope)*1e3:.1f} ms",
          flush=True)
    # Arithmetic for the roofline note: hat build + contraction dominate.
    nbx = -(-xg.shape[0] // 8) * -(-zg.shape[0] // 8)
    flops = A * E * nbx * 64 * 192 * 5  # [n_blk*block*window] * ~5 VPU ops
    print(f"~{flops/1e9:.0f} GFLOP VPU-equivalent -> "
          f"{flops/slope/1e12:.2f} TFLOP/s effective", flush=True)


if __name__ == "__main__":
    main()
