"""Benchmark: tactile frames/sec (RGB + markers) on the current chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The metric is the full GelSight tactile pipeline throughput — camera depth ->
height map -> indentation -> gel deformation -> Taxim optical RGB -> FOTS
marker motion — batched over environments, jitted, steady-state, on whatever
device JAX provides (TPU under the driver, CPU in dev).

vs_baseline is measured against the driver-set north star of 50,000
frames/sec/chip (BASELINE.md: >= 50k fps on v5p-8 at 4096 envs => 6,250
fps/chip x 8; we report per-chip throughput against 6,250).
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from tacex_tpu.sensors.gelsight.sensor import GelSightSensor
from tacex_tpu.sensors.gelsight.sensor_cfg import gelsight_mini_cfg

# Reference-default sensor resolution (gsmini_cfg.py: camera 320x240).
CAM_W, CAM_H = 320, 240
NUM_ENVS = 256
ITERS = 20
PER_CHIP_TARGET = 50_000 / 8  # north-star split across a v5p-8


def make_depth(num_envs: int, h: int, w: int) -> jnp.ndarray:
    rng = np.random.default_rng(0)
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij")
    frames = np.empty((num_envs, h, w), np.float32)
    for i in range(num_envs):
        cy = h / 2 + rng.uniform(-h / 6, h / 6)
        cx = w / 2 + rng.uniform(-w / 6, w / 6)
        r_mm = rng.uniform(2.5, 5.0)
        pixmm = 0.0295 * 2
        r_px = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2) * pixmm
        z = np.where(r_px < r_mm, r_mm - np.sqrt(np.maximum(r_mm**2 - r_px**2, 0)), r_mm)
        press = rng.uniform(0.2, 1.5)
        frames[i] = 0.0285 + (z - z.min()) / 1000.0 - press / 1000.0
    return jnp.asarray(frames)


def main() -> None:
    cfg = gelsight_mini_cfg(camera_resolution=(CAM_W, CAM_H), tactile_img_res=(CAM_W, CAM_H))
    sensor = GelSightSensor(cfg, num_envs=NUM_ENVS)
    state = sensor.init_state()
    depth = make_depth(NUM_ENVS, CAM_H, CAM_W)

    step = jax.jit(sensor.update)
    # warmup / compile
    s, out = step(state, depth)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        s, out = step(s, depth)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = NUM_ENVS * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "tactile_frames_per_sec_per_chip_rgb_markers_320x240",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / PER_CHIP_TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
