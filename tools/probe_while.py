"""Probe: does Mosaic lower lax.while_loop with many (rows,128) f32 plane
carries + a vector->scalar reduction condition?  Prerequisite for the
regeneration megakernel loop (pallas_path film mode).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_while.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(seed_ref, out_ref):
    shape = out_ref.shape
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
    # per-lane trip counts 1..~20, data-dependent
    target = jnp.floor(row + col * 0.1) % 19.0 + 1.0 + seed_ref[0] * 0.0

    def cond(c):
        cnt, acc, rng = c
        return jnp.max(jnp.where(cnt < target, 1.0, 0.0)) > 0.0

    def body(c):
        cnt, acc, rng = c
        live = cnt < target
        rng2 = rng * jnp.uint32(1664525) + jnp.uint32(1013904223)
        rng = jnp.where(live, rng2, rng)
        # (uint32 -> f32 casts are unsupported in Mosaic; keep the rng
        # dependency via a uint compare so it isn't dead-code eliminated)
        acc = acc + jnp.where(live & (rng != jnp.uint32(0xFFFFFFFF)), 1.0, 0.0)
        cnt = cnt + jnp.where(live, 1.0, 0.0)
        return cnt, acc, rng

    zero = jnp.zeros(shape, jnp.float32)
    rng0 = jnp.full(shape, 12345, jnp.uint32)
    cnt, acc, rng = jax.lax.while_loop(cond, body, (zero, zero, rng0))
    out_ref[:] = acc


def main():
    rows, lanes = 16, 128
    block = pl.BlockSpec((rows, lanes), lambda i, _s: (i, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(4,), in_specs=[], out_specs=[block],
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((4 * rows, lanes), jnp.float32)],
    )
    (out,) = fn(jnp.asarray([0], jnp.int32))
    out = np.asarray(out)
    row = np.arange(4 * rows) % rows
    col = np.arange(lanes)
    expect = np.floor(row[:, None] + col[None, :] * 0.1) % 19.0 + 1.0
    ok = np.array_equal(out, expect.astype(np.float32))
    print("while_loop probe:", "OK" if ok else "MISMATCH", out.sum(),
          expect.sum())


if __name__ == "__main__":
    main()
