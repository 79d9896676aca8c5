"""Load the reference TaximJax implementation as a golden-test oracle.

The reference's JAX Taxim backend (reference source/tacex/.../gpu_taxim/sim/
taxim_jax.py) has no Isaac Sim dependency, so we can execute it directly to
produce golden outputs for parity tests of our own, independently structured
implementation. We only *run* the reference here (read-only, test-time); no
reference code is copied into the framework.

Two shims are needed to execute it under modern JAX:
  * ``jaxlib.xla_extension`` no longer exists — stubbed with jax.Device;
  * ``jax.jit(device=...)`` kwarg was removed — proxied away.
And the calibration snapshot ships ``dataPack.npz`` only as a git-lfs pointer,
so golden tests build a temp calibration folder with a constant background
frame (constant f0 makes the reference's and our background processing
provably identical).
"""

from __future__ import annotations

import functools
import importlib.util
import shutil
import sys
import types
from pathlib import Path

import numpy as np

REF_SIM_DIR = Path("/root/reference/source/tacex/tacex/simulation_approaches/gpu_taxim/sim")
REF_CALIB_DIR = Path(
    "/root/reference/source/tacex_assets/tacex_assets/data/Sensors/GelSight_Mini/calibs/640x480"
)

BG_CONST = 0.42


def reference_available() -> bool:
    return REF_SIM_DIR.exists() and (REF_CALIB_DIR / "polycalib.npz").exists()


@functools.lru_cache(maxsize=1)
def make_golden_calib_dir(tmp_root: str) -> Path:
    """Temp calibration folder: real calib files + synthetic constant f0."""
    dst = Path(tmp_root) / "golden_calib"
    dst.mkdir(parents=True, exist_ok=True)
    for name in ["params.json", "polycalib.npz", "gelmap.npy", "shadowTable.npz"]:
        shutil.copy2(REF_CALIB_DIR / name, dst / name)
    f0 = np.full((480, 640, 3), BG_CONST * 255.0, dtype=np.float32)
    np.savez(dst / "dataPack.npz", f0=f0)
    return dst


class _JaxProxy:
    """Delegates to jax but drops the removed ``device=`` kwarg of jit."""

    def __init__(self):
        import jax

        self._jax = jax

    def jit(self, *args, **kwargs):
        kwargs.pop("device", None)
        return self._jax.jit(*args, **kwargs)

    def __getattr__(self, item):
        return getattr(self._jax, item)


@functools.lru_cache(maxsize=1)
def load_reference_taxim_jax_module():
    import jax

    # stub jaxlib.xla_extension
    if "jaxlib.xla_extension" not in sys.modules:
        import jaxlib

        stub = types.ModuleType("jaxlib.xla_extension")
        stub.Device = jax.Device
        sys.modules["jaxlib.xla_extension"] = stub
        jaxlib.xla_extension = stub

    pkg = types.ModuleType("ref_taxim_sim")
    pkg.__path__ = [str(REF_SIM_DIR)]
    sys.modules["ref_taxim_sim"] = pkg
    for name in ["calibration", "taxim_impl", "taxim_jax"]:
        spec = importlib.util.spec_from_file_location(
            f"ref_taxim_sim.{name}", REF_SIM_DIR / f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_taxim_sim.{name}"] = mod
        spec.loader.exec_module(mod)
    tj = sys.modules["ref_taxim_sim.taxim_jax"]
    tj.jax = _JaxProxy()
    return tj


def make_reference_taxim(calib_folder: Path, shadow_method: str = "fast"):
    mod = load_reference_taxim_jax_module()
    return mod.TaximJax(calib_folder=Path(calib_folder), shadow_method=shadow_method)


def sphere_height_map(
    h: int, w: int, *, radius_mm: float = 4.0, pixmm: float = 0.0295 * 2, center=None
) -> np.ndarray:
    """Height map of a sphere touching the gel plane (processed format, mm).

    0 where the sphere rests on the gel top; grows away from the contact
    point; background clamped to a far value. Feed through press_depth to
    push it into the gel.
    """
    if center is None:
        center = (h / 2.0, w / 2.0)
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij")
    r_px = np.sqrt((yy - center[0]) ** 2 + (xx - center[1]) ** 2) * pixmm
    inside = r_px < radius_mm
    z = np.where(inside, radius_mm - np.sqrt(np.maximum(radius_mm**2 - r_px**2, 0.0)), radius_mm)
    return z.astype(np.float32)
