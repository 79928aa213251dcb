"""PySpark-native analytics engine with the query/data-processing surface of
the reference project (Starlordlwp/YoutubeAnalyzerProject-Big-Data-).

The reference is a MongoDB + PySpark batch-analytics system over the 2007-08
YouTube crawl (see /root/repo/SURVEY.md).  This package re-expresses its full
operator inventory -- scans, typed coercion, dynamic filters, hash aggregates,
bucketed histograms, degree/graph analytics, PageRank, ALS recommendations,
top-K serving -- as idiomatic Spark DataFrame programs, and extends it with
the operators a large-scale training-data pipeline needs (dedup families,
ANN similarity search, text quality analysis, multimodal plumbing,
structured streaming).

Design rules (enforced throughout):
  * DataFrame/SQL first; Catalyst plans everything.  No RDDs.
  * Built-in `pyspark.sql.functions` in hot paths; Pandas UDFs only where
    built-ins cannot express the semantics (multimodal decode).
  * Broadcast small dimensions, pre-aggregate before joins, never collect
    to the driver inside an operator.
"""

from youtubeanalyzerproject_big_data__spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
