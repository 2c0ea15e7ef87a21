"""Build dist/ccspark.zip for ``spark-submit --py-files`` (north-rule
deployment path). Pure stdlib; deterministic file order."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "cc_crawl_statistics_spark"


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "ccspark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in sorted(os.walk(os.path.join(REPO, PKG))):
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build())
