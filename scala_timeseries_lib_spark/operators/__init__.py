"""DataFrame-level operators over entries tables.

An *entries table* is any DataFrame with one or more key columns (the series
identity, e.g. ``url``/``signal`` or ``user_id``/``event_type``) plus:

- ``ts``       long  -- epoch milliseconds (time unit is abstract, like the
                        reference's README.md:30-31)
- ``value``    double
- ``validity`` long  -- > 0; the entry covers ``[ts, ts + validity)``

Operators that Catalyst can express stay JVM-side (filters, clamps, explode-
based splitting, window frames, hash aggregations); only interval-exact
semantics that have no relational equivalent (general merge, closest-in-
window sampling, exact sliding-window emission) drop into Arrow-batched
``applyInPandas`` kernels from ``scala_timeseries_lib_spark.kernel``.
"""
