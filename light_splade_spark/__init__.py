"""light_splade_spark — a PySpark-native inverted-index + BM25 query engine.

A from-scratch Spark re-expression of the query/data-processing capabilities of
``bizreach-inc/light-splade`` (reference at /root/reference, read-only):

* text -> sparse term-weight expansion (reference ``models/splade.py:136-180``)
  re-expressed as JVM-side tokenize + explode + groupBy aggregation;
* inverted-index build (reference ``evaluator/sparse_indexer.py``) re-expressed
  as salted two-phase posting-list aggregation with delta-gap + VByte
  compression and block-max metadata;
* exact top-k term-weighted scoring (reference
  ``evaluator/sparse_retriever.py:78-96``) re-expressed as (a) an exact SQL
  join+agg+window path and (b) a block-max WAND mapInPandas kernel;
* ranking metrics (reference ``evaluator/metrics_evaluator.py``) in Spark SQL;
* NDJSON loaders with strict schemas (reference ``data/``);
* plus large-scale training-data pipeline operators (dedup, similarity search,
  text quality, multimodal plumbing) that the 100 TB use-case needs.

Everything here is public-knowledge Spark: DataFrame/SQL first, Catalyst does
the optimizing, pandas/Arrow UDFs only where built-ins cannot express the
semantics (VByte packing, WAND).
"""

__version__ = "0.1.0"

from light_splade_spark.session import get_spark  # noqa: F401
