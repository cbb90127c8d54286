"""Web-scale payload functions: dedup, similarity search, text analysis,
multimodal binary plumbing.

Everything here is built from pyspark.sql builtins (higher-order array
functions, md5, bit ops) so the hot path stays inside whole-stage codegen;
the only Python is the multimodal decode stub (mapInPandas, deliberately --
image/audio libs are not available in this environment, so the decode is a
clearly-marked deterministic fake with real Spark plumbing).

Cross-engine portability contract (needed for the DuckDB oracles): the
word hash is ``int(md5(word)[:8], 16)`` -- first 32 bits of md5 as an
unsigned int -- identical in Spark (``conv(substring(md5(x),1,8),16,10)``)
and DuckDB (``CAST('0x' || substr(md5(x),1,8) AS BIGINT)``).
"""
