"""Profiling / tracing utilities (SURVEY.md §5 tracing row).

The reference's only observability was a tqdm rays/s bar and print
statements (CustomIntegrator.py:382-389,402-404); tpu_rt couples
jax.profiler device traces with the renderers' ray counters.

Usage:
    with trace("/tmp/tpu_rt_trace"):
        img = render(scene, spp=16)
    # -> TensorBoard / xprof trace directory with XLA op timeline

    stats = RenderStats()
    img = render(scene, spp=64)
    stats.record("cbox", render.last_ray_count)
    print(stats.summary())

bench.py enables the device trace with BENCH_PROFILE=<dir>.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler device trace around a block (TensorBoard format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RenderStats:
    """Lightweight rays/sec + wall-time aggregator for render calls."""

    def __init__(self):
        self.entries = []
        self._t0 = time.perf_counter()

    def record(self, tag: str, n_rays: int, wall_s: float | None = None):
        now = time.perf_counter()
        if wall_s is None:
            wall_s = now - self._t0
        self._t0 = now
        self.entries.append(
            {"tag": tag, "rays": int(n_rays), "wall_s": float(wall_s),
             "rays_per_s": int(n_rays) / max(wall_s, 1e-12)}
        )

    def summary(self):
        lines = []
        for e in self.entries:
            lines.append(
                f"{e['tag']}: {e['rays']:,} rays in {e['wall_s']*1e3:.1f} ms"
                f" = {e['rays_per_s']/1e6:.1f}M rays/s"
            )
        total_rays = sum(e["rays"] for e in self.entries)
        total_s = sum(e["wall_s"] for e in self.entries)
        if len(self.entries) > 1:
            lines.append(
                f"total: {total_rays:,} rays, {total_s:.3f} s, "
                f"{total_rays/max(total_s,1e-12)/1e6:.1f}M rays/s"
            )
        return "\n".join(lines)
