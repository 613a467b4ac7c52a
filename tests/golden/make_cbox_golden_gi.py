"""Generate the independent full-GI cbox golden (provenance script).

Renders /root/reference/scenes/cbox.xml's geometry with the standalone
NumPy path tracer in tests/golden_reference.py (render_path_gi — written
from scratch, no tpu_rt code) at 128^2, box filter, max_depth 6.

Output: tests/golden/cbox_128_gi_independent.npy (float32 [128,128,3])
  + cbox_128_gi_independent.json (spp, seed set, renderer hash inputs).

Run:  python tests/golden/make_cbox_golden_gi.py [total_spp]
(multiprocessed over seeds; ~minutes on a modern host for 8192 spp).
"""

import json
import multiprocessing as mp
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _one(args):
    seed, spp = args
    from golden_reference import cbox_scene_gi, render_path_gi

    shapes, mats, li = cbox_scene_gi()
    return render_path_gi(
        shapes, mats, li, 128, 128, (0, 0, 4), (0, 0, 0), (0, 1, 0),
        39.3077, spp=spp, max_depth=6, seed=seed, wave=16,
    )


def main(total_spp=8192, workers=None):
    workers = workers or min(mp.cpu_count(), 16)
    per = -(-total_spp // workers)
    jobs = [(1000 + i, per) for i in range(workers)]
    with mp.Pool(workers) as pool:
        imgs = pool.map(_one, jobs)
    img = np.mean(imgs, axis=0).astype(np.float32)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "cbox_128_gi_independent.npy")
    np.save(out, img)
    with open(out.replace(".npy", ".json"), "w") as f:
        json.dump({
            "scene": "/root/reference/scenes/cbox.xml (geometry transcribed "
                     "independently in golden_reference.cbox_scene_gi)",
            "renderer": "tests/golden_reference.py render_path_gi "
                        "(standalone NumPy, NEE-only split estimator)",
            "resolution": 128, "max_depth": 6, "filter": "box",
            "spp_total": per * workers,
            "seeds": [j[0] for j in jobs],
            "luminaire_radiance": [1.0, 1.0, 1.0],
        }, f, indent=2)
    print("wrote", out, "mean=%.5f" % img.mean(), "spp=%d" % (per * workers))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8192)
