"""spark-submit --py-files packaging.

Builds a zip of the ``scala_timeseries_lib_spark`` package so that Python
workers (which do not inherit the driver's ``sys.path``) can unpickle the
Arrow-UDF kernels. ``plans.session.get_spark`` ships it automatically via
``SparkContext.addPyFile``; for cluster deployment the same artifact is what
you pass to ``spark-submit --py-files``.
"""

from __future__ import annotations

import os
import zipfile

__all__ = ["build_pyfiles_zip", "ship_package"]


def build_pyfiles_zip(dest_dir: str | None = None) -> str:
    """Zip the package sources; returns the zip path. Idempotent per content:
    rewrites only when a source file is newer than the existing zip."""
    import tempfile

    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.dirname(pkg_dir)
    dest_dir = dest_dir or tempfile.gettempdir()
    zip_path = os.path.join(dest_dir, "scala_timeseries_lib_spark.zip")

    sources = []
    for dirpath, _dirnames, filenames in os.walk(pkg_dir):
        for fn in filenames:
            if fn.endswith(".py"):
                sources.append(os.path.join(dirpath, fn))
    if os.path.exists(zip_path):
        zip_mtime = os.path.getmtime(zip_path)
        if all(os.path.getmtime(s) <= zip_mtime for s in sources):
            return zip_path
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for src in sorted(sources):
            zf.write(src, os.path.relpath(src, root))
    return zip_path


def ship_package(spark) -> str:
    """Make the package importable on all Python workers of this session."""
    zip_path = build_pyfiles_zip()
    spark.sparkContext.addPyFile(zip_path)
    return zip_path
