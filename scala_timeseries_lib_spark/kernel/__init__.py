"""Pure numpy/pandas kernels implementing the reference's step-function algebra.

No Spark imports here: these functions are the single source of truth for
interval semantics and are exercised (a) directly against the reference's
golden fixtures and (b) from inside Arrow-batched pandas UDFs in
``scala_timeseries_lib_spark.operators``.

Entry representation conventions:

- "tuples" form: a list of ``(ts: int, value, validity: int)`` — used by the
  sequential reference kernels (exact semantics, any value type).
- "arrays" form: three numpy arrays ``(ts: int64, value: float64|object,
  validity: int64)`` — used by the vectorized kernels on the Spark hot path.

Both describe the same series: each entry is a constant value on
``[ts, ts + validity)``; entries are ordered by ``ts`` and non-overlapping
after fitting.
"""
