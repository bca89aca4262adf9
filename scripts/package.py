"""Build the --py-files artifact for cluster submission.

The north rule's deployment shape is ``spark-submit --py-files
oec_etl_spark.zip -m oec_etl_spark.cli replay ...`` on a multi-executor
cluster (SURVEY.md §3). This packs the package (sources only, no tests/
caches) into a deterministic zip: files are added in sorted order with
a fixed timestamp, so rebuilding an unchanged tree is byte-identical —
convenient for content-addressed artifact stores.

Usage: python scripts/package.py [out.zip]   (default: dist/oec_etl_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "oec_etl_spark"
FIXED_DATE = (2024, 1, 1, 0, 0, 0)  # deterministic member metadata


def build(out_path: str) -> list[str]:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    members: list[str] = []
    for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                members.append(os.path.relpath(full, REPO))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for rel in members:
            info = zipfile.ZipInfo(rel, date_time=FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(os.path.join(REPO, rel), "rb") as fh:
                zf.writestr(info, fh.read())
    return members


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", PKG + ".zip")
    members = build(out)
    print(f"{out}: {len(members)} modules")
    print(f"submit: spark-submit --py-files {out} -m {PKG}.cli replay --changes ... --target ... --checkpoint ...")
    return 0


if __name__ == "__main__":
    sys.exit(main())
