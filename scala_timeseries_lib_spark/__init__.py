"""A brand-new PySpark-native time-series rollup / downsample / retention engine.

Re-expresses the query semantics of Sqooba/scala-timeseries-lib (reference at
/root/reference, studied for behavior only) as an idiomatic Spark engine:

- ``kernel``     -- pure numpy/pandas kernels, Spark-free, fixture-exact
                    (TSEntry fitting, interval merge, integrals, sliding
                    windows, sampling, bucketing/rollup, Gorilla codec).
- ``operators``  -- DataFrame-level operators. Everything expressible with
                    built-in pyspark.sql functions stays JVM-side
                    (trim/slice/fill/step-integral/rollup); interval-exact
                    semantics run as Arrow-batched ``applyInPandas`` kernels.
- ``sources``    -- deterministic synthetic Common-Crawl-style ``pages``
                    table, byte-stable text extraction, testdata loaders.
- ``functions``  -- web-scale payload functions: dedup (exact/minhash/simhash/
                    jaccard), embedding similarity search, text analysis,
                    multimodal binary plumbing.
- ``plans``      -- continuous-aggregate retention tiers (raw->1m->1h->1d),
                    checkpoint/watermark resumability, lineage metrics,
                    SparkSession/AQE configuration.
- ``streaming``  -- incremental micro-batch append with pending-entry state.

The data model is the reference's step-function algebra: an entry
``(ts, value, validity)`` is a constant value on the half-open interval
``[ts, ts + validity)`` (reference: immutable/TSEntry.scala:17,131,136); a
series is the ordered, non-overlapping set of entries of one
``(key..., signal)`` group of a DataFrame.
"""

__version__ = "0.1.0"
