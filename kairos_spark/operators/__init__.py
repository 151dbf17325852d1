"""Beyond-parity operators for large-scale training-data pipelines:
deduplication, similarity search, text analysis, multimodal columns.

All operators are pure DataFrame→DataFrame functions built from
builtin pyspark.sql.functions (JVM-side) unless a Pandas UDF is
genuinely required (vector math, media decode); none collect to the
driver."""

from kairos_spark.operators import (  # noqa: F401
    dedup,
    multimodal,
    profiling,
    similarity,
    text,
)
