"""Build the --py-files artifact: dist/incubator_sedona_spark.zip.

The north rule's deployment shape is `spark-submit --py-files <zip> job.py`
on a multi-executor cluster; this zips the pure-Python engine package (no
compiled extensions, no data files needed at import time) so executors can
import it from the shipped archive.  tests/test_pyfiles_deploy.py runs an
actual spark-submit against the artifact from a directory where the repo
package is NOT importable, proving the zip is self-contained.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out_path: str | None = None) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "incubator_sedona_spark")
    out = out_path or os.path.join(repo, "dist", "incubator_sedona_spark.zip")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, repo)
                z.write(full, rel)
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
