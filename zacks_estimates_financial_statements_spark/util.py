"""Deployment helpers."""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_ATTR = "_zacks_estimates_financial_statements_spark_pyfiles_shipped"


def ensure_package_on_executors(spark: SparkSession) -> None:
    """Ship this package to Python workers via ``addPyFile``.

    Closures passed to ``mapInPandas``/UDFs reference modules of this
    package by name; workers must be able to import them. When the driver
    script runs outside the repo (``sys.path`` hack, no installation),
    worker processes fail with ModuleNotFoundError. Zipping the package
    once per session and calling ``addPyFile`` fixes this for every
    deployment mode (local, YARN, k8s) — the standard way to ship an
    uninstalled Python package.
    """
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(tempfile.gettempdir(),
                            f"{pkg_name}-{os.getpid()}.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join(pkg_name,
                                           os.path.relpath(full, pkg_dir))
                        zf.write(full, rel)
    sc.addPyFile(zip_path)
    setattr(sc, _SHIPPED_ATTR, True)
