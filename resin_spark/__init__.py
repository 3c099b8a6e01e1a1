"""resin_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of kreeben/resin (vector-space search
engine / vector DB / columnar KV store), re-expressed Spark-first.

Reference parity map lives in SURVEY.md §2. Every operator is built on
the DataFrame API so Catalyst owns the physical plan; Python UDFs only
where semantics genuinely exceed built-ins (hashed-ngram embedding,
multimodal decode plumbing), and then always Arrow-batched.
"""

__version__ = "0.1.0"

from resin_spark.session import get_spark  # noqa: F401
from resin_spark.io import load_tables  # noqa: F401
