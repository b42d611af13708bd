"""PySpark-native analytics engine with the query/data-processing
capabilities of degsryjxyjr/DataEngineeringProject (see SURVEY.md).

The reference is an eager pandas/Airflow ETL; this package re-expresses
its operator semantics (SURVEY.md §2) as lazy, Catalyst-optimized
DataFrame transformations, plus the north-star extensions (streaming,
dedup, similarity search, text analysis, multimodal plumbing) designed
for 100 TB scale: no driver-side collects except tiny scalars, shuffles
only on declared keys, broadcast joins for small dims.
"""

from dataengineeringproject_spark.session import get_spark

__all__ = ["get_spark"]
