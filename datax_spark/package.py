"""Build the --py-files artifact: ``python -m datax_spark.package``
writes ``dist/datax_spark.zip`` containing the package sources — the
artifact ``spark-submit --py-files`` ships to every executor (the
cluster-run half of the north rule; see submit.py).

Plain zipfile of .py sources, deterministic entry order, no setuptools —
executors only need the importable package on their PYTHONPATH."""

from __future__ import annotations

import os
import sys
import zipfile


def build(out_dir: str = "dist") -> str:
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    repo_root = os.path.dirname(pkg_root)
    os.makedirs(os.path.join(repo_root, out_dir), exist_ok=True)
    out = os.path.join(repo_root, out_dir, "datax_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for base, _dirs, files in sorted(os.walk(pkg_root)):
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(base, fn)
                rel = os.path.join(
                    "datax_spark", os.path.relpath(full, pkg_root)
                )
                z.write(full, rel)
    return out


if __name__ == "__main__":
    print(build(*(sys.argv[1:] or [])))
