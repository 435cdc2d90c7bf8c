"""Large-scale training-data pipeline operators.

openGemini itself stops at time-series/log analytics; a 100 TB corpus
pipeline additionally needs dedup, similarity search, text analysis, and
multimodal plumbing. Everything here is DataFrame-native: hash/array
built-ins on the JVM hot path, `mapInPandas` only where a real decoder
would live (stubbed — see multimodal.py).

Every operator has a DuckDB-oracle twin generated from the SAME constants
(see suite_datapipe.py) so the driver's correctness gate covers them.
"""

from opengemini_spark.datapipe import dedup, models, similarity, text, multimodal  # noqa: F401
