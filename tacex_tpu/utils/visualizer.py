"""Headless training/episode observability.

Counterpart of the reference's GUI observability stack (SURVEY §5:
``DirectLiveVisualizer`` + ``LiveLinePlot``/``ImagePlot`` streaming per-env
obs/action/reward plots into the Isaac UI — reference
source/tacex_tasks/.../utils/direct_live_visualizer.py:20-206). Without a GUI
process, the equivalent is a metrics recorder that accumulates scalar series
and image frames and renders them to PNG dashboards / strips on demand.
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import numpy as np


class LiveVisualizer:
    """Accumulate scalar series + image frames; dump PNG dashboards."""

    def __init__(self, out_dir: str | Path = "viz"):
        self.out_dir = Path(out_dir)
        self.series: dict[str, list[float]] = defaultdict(list)
        self.frames: dict[str, list[np.ndarray]] = defaultdict(list)

    # ------------------------------------------------------------------ feed
    def add_scalars(self, step: int, scalars: dict):
        self.series["step"].append(step)
        for k, v in scalars.items():
            self.series[k].append(float(v))

    def add_frame(self, name: str, frame: np.ndarray, keep_last: int = 16):
        buf = self.frames[name]
        buf.append(np.asarray(frame))
        if len(buf) > keep_last:
            del buf[0]

    # ------------------------------------------------------------------ dump
    def save_plots(self, filename: str = "metrics.png"):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        keys = [k for k in self.series if k != "step"]
        if not keys:
            return None
        steps = self.series["step"]
        cols = min(3, len(keys))
        rows = (len(keys) + cols - 1) // cols
        fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 2.5 * rows), squeeze=False)
        for i, k in enumerate(keys):
            ax = axes[i // cols][i % cols]
            ax.plot(steps[: len(self.series[k])], self.series[k])
            ax.set_title(k, fontsize=9)
            ax.grid(alpha=0.3)
        fig.tight_layout()
        self.out_dir.mkdir(parents=True, exist_ok=True)
        path = self.out_dir / filename
        fig.savefig(path, dpi=110)
        plt.close(fig)
        return path

    def save_frame_strip(self, name: str, filename: str | None = None):
        from PIL import Image

        frames = self.frames.get(name)
        if not frames:
            return None
        fr = [np.clip(np.asarray(f, np.float32), 0, 1) for f in frames]
        fr = [f[..., None].repeat(3, -1) if f.ndim == 2 else f for f in fr]
        strip = np.concatenate(fr, axis=1)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        path = self.out_dir / (filename or f"{name}_strip.png")
        Image.fromarray((strip * 255).astype(np.uint8)).save(path)
        return path
