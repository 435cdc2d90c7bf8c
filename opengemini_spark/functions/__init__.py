"""openGemini scalar-function surface on Spark (SURVEY.md §2.8).

Math/string/label/time functions registered via openGemini's
``RegistryMaterializeFunction`` (query/math.go:21-132,
query/string_functions.go:43-164, query/prom_time_functions.go) map almost
1:1 onto ``pyspark.sql.functions`` built-ins — everything stays inside
whole-stage codegen. The few gaps (ip helpers, url parts) are built from
integer/regex primitives, still JVM-side, never row-at-a-time Python.
"""

from opengemini_spark.functions import network, scalar  # noqa: F401
