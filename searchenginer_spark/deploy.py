"""Ship this package to Spark Python workers.

On a real cluster the job runs ``spark-submit --py-files searchenginer_spark.zip``
(north-rule contract). When the engine is used as a library from an existing
SparkSession (tests, the grading driver), the workers' Python may not have
the repo on sys.path — ``ship_package`` reproduces the --py-files behavior
at runtime: zip the package once and ``sc.addPyFile`` it, so every pickled
UDF/closure that references ``searchenginer_spark`` imports cleanly on
workers regardless of their cwd/PYTHONPATH.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_shipped: set[int] = set()


def package_zip() -> str:
    """Build (once per source state) a zip of the searchenginer_spark package."""
    import searchenginer_spark

    pkg_dir = os.path.dirname(os.path.abspath(searchenginer_spark.__file__))
    stamp = 0
    for root, _dirs, files in os.walk(pkg_dir):
        for f in files:
            if f.endswith(".py"):
                stamp = max(stamp, int(os.path.getmtime(os.path.join(root, f))))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"searchenginer_spark-pyfiles-{stamp}.zip"
    )
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    arc = os.path.join(
                        "searchenginer_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, arc)
        os.replace(tmp, zip_path)
    return zip_path


def ship_package(spark) -> None:
    """Idempotently add the package zip to the session's Python path."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _shipped:
        return
    sc.addPyFile(package_zip())
    _shipped.add(key)
