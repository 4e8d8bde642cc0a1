"""Build the --py-files artifact: dist/text_extract_api_spark.zip.

The north rule ships the engine "via spark-submit --py-files" — executors
(and, in client mode, the driver) import the package from this zip, not
from a checkout. The zip is deterministic (sorted entries, fixed
timestamp) so its md5 doubles as a deploy fingerprint.

Usage:
    python tools/package_pyfiles.py [out_zip]
    spark-submit --py-files dist/text_extract_api_spark.zip \
        jobs/spans_extract.py --sf-dir ... --out ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "text_extract_api_spark"
# zip timestamps can't predate 1980; any fixed value keeps builds bit-identical
_EPOCH = (2020, 1, 1, 0, 0, 0)


def build_zip(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    entries: list[tuple[str, str]] = []
    pkg_root = os.path.join(REPO, PACKAGE)
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith((".py", ".yaml")):
                full = os.path.join(dirpath, fn)
                entries.append((full, os.path.relpath(full, REPO)))
    # conf/ travels too: the registry loads conf/strategies.yaml relative to
    # the package's parent when present
    conf = os.path.join(REPO, "conf")
    if os.path.isdir(conf):
        for fn in sorted(os.listdir(conf)):
            if fn.endswith(".yaml"):
                full = os.path.join(conf, fn)
                entries.append((full, os.path.relpath(full, REPO)))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in entries:
            info = zipfile.ZipInfo(arc, date_time=_EPOCH)
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                zf.writestr(info, f.read(), zipfile.ZIP_DEFLATED)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", f"{PACKAGE}.zip")
    print(build_zip(out))
