"""gomaxscale_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``rafaeljusto/gomaxscale`` MaxScale-CDC
consumer, re-imagined Spark-first.

Layout
------
- ``sources/``    — the CDC surface: brace-depth JSON framing
  (reference: stream.go:28-117), DDL-event → StructType schema registry
  (reference: types.go:51-124), a Structured Streaming source speaking the
  MaxScale CDC wire protocol (reference: gomaxscale.go:46-168), and a mock
  MaxScale server for tests (reference: gomaxscale_test.go:313-489).
- ``operators/``  — relational + LLM-data-pipeline operators (joins, aggs,
  windows, as-of, dedup/MinHash-LSH/SimHash, cosine similarity, text
  analysis, multimodal plumbing). All declarative DataFrame compositions;
  Pandas UDFs only where built-ins can't express the semantics.
- ``functions/``  — scalar/JSON helper expressions.
- ``streaming/``  — event-time windowing, watermark/late-data handling,
  streaming dedup, snapshot materialization, stats instrumentation
  (reference: gomaxscale.go:120-135 WithStats → StreamingQueryListener).
- ``plans/``      — the query catalog: every operator exposed as a
  ``(spark, sf_dir) -> DataFrame`` callable with a DuckDB oracle-SQL twin.

Everything is DataFrame/Catalyst; there are no RDDs. Each operator's
docstring carries a *Scale* note: how it behaves on a 1000-executor
cluster at 100 TB (shuffle structure, broadcast choices, skew handling).
"""

__version__ = "0.1.0"
