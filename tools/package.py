"""Build dist/kgforge.zip for spark-submit --py-files.

    python tools/package.py
    spark-submit --py-files dist/kgforge.zip kgforge/cli.py run ...
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def build(out: Path | None = None) -> Path:
    out = out or REPO / "dist" / "kgforge.zip"
    out.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted((REPO / "kgforge").rglob("*.py")):
            z.write(py, py.relative_to(REPO))
    return out


if __name__ == "__main__":
    print(build())
