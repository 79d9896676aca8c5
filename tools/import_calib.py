"""Import GelSight calibration data from the reference checkout into the repo.

The Taxim calibration artifacts (polycalib.npz, gelmap.npy, shadowTable.npz,
params.json — reference source/tacex_assets/.../calibs/640x480/) are sensor
measurement data, not code, and must be reused verbatim (SURVEY.md §2.1).
``dataPack.npz`` and ``0.png`` are unfetched git-lfs pointers in the snapshot
and are skipped; the framework synthesizes a background when they're absent.
"""

from __future__ import annotations

import shutil
from pathlib import Path

REF = Path("/root/reference/source/tacex_assets/tacex_assets/data/Sensors/GelSight_Mini/calibs/640x480")
DST = Path(__file__).resolve().parents[1] / "tacex_tpu" / "assets" / "gelsight_mini" / "calibs" / "640x480"

FILES = ["params.json", "polycalib.npz", "gelmap.npy", "shadowTable.npz"]


def is_lfs_pointer(path: Path) -> bool:
    with path.open("rb") as f:
        head = f.read(64)
    return head.startswith(b"version https://git-lfs")


def main() -> None:
    DST.mkdir(parents=True, exist_ok=True)
    for name in FILES:
        src = REF / name
        if not src.exists() or is_lfs_pointer(src):
            print(f"skip (missing or lfs pointer): {name}")
            continue
        shutil.copy2(src, DST / name)
        print(f"copied {name}")


if __name__ == "__main__":
    main()
