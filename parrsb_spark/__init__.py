"""parrsb_spark — a PySpark-native link-graph analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference (thilinarmtb/parRSB, an MPI/C recursive-spectral-bisection
library), re-expressed Spark-first over an edge DataFrame ``(src, dst)``
extracted from Common-Crawl-style web pages.

Layout
------
- ``session``    SparkSession factory tuned for the engine
- ``config``     engine options + env-var overrides (ref: src/parrsb.c:26-77)
- ``sources``    synthetic pages, text/link extraction, edges, dense ids
- ``functions``  SpMV gather-scatter, reductions, salting, hashing
- ``operators``  PageRank, connected components, label propagation,
                 triangles, Fiedler/Lanczos, RSB/RCB/RIB partitioners,
                 partition statistics, dedup, similarity, text analysis
- ``plans``      lineage / checkpoint / resume protocol
- ``streaming``  Structured Streaming kernels over the events table
"""

from parrsb_spark.config import EngineOptions, default_options

__all__ = ["EngineOptions", "default_options"]
__version__ = "0.1.0"
