"""Ship this package's code to Python workers.

Python UDF closures (``mapInPandas``, ``applyInPandasWithState``) are
serialized by *reference* to their defining module, so every Python
worker must be able to ``import convert_parquet_to_csv_spark``. That
holds when the driver's cwd happens to be the repo root — and breaks
with ``ModuleNotFoundError`` from any other cwd, or on a real cluster
where executors never saw the repo checkout.

:func:`ensure_package_shipped` is the standard fix, applied lazily:
zip the package once and ``sc.addPyFile`` it, which distributes the
zip to every executor and prepends it to worker ``sys.path``. Called
by every operator that builds a Python-UDF plan, so it works even when
the SparkSession was created by an external harness we don't control.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

# SparkContext ids already shipped to — addPyFile is per-context, and
# re-adding the same path is at best a warning.
_SHIPPED: set[int] = set()


def ensure_package_shipped(spark: SparkSession) -> None:
    """Idempotently distribute this package as a zip via ``addPyFile``."""
    sc = spark.sparkContext
    key = id(sc._jsc)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_base = os.path.join(
        tempfile.gettempdir(), f"cptc_spark_pkg_{os.getpid()}"
    )
    shutil.make_archive(
        zip_base,
        "zip",
        root_dir=os.path.dirname(pkg_dir),
        base_dir=os.path.basename(pkg_dir),
    )
    sc.addPyFile(zip_base + ".zip")
    _SHIPPED.add(key)
