"""Ultrasound post-processing: DAS beamforming, envelopes, B-mode, plus
ultraspy-compatible facades (build_probe / GridScan / DelayAndSum)."""

from tpu_rt.us.api import DelayAndSum, GridScan, build_probe  # noqa: F401
from tpu_rt.us.beamform import (  # noqa: F401
    apply_pulse,
    bmode_pipeline,
    das_beamform,
    grid_scan,
    hilbert_envelope,
    log_compress,
    pulse_kernel,
)
from tpu_rt.us.pipeline import us_render  # noqa: F401
