from demo_bigdata_spark.functions.scalar import (  # noqa: F401
    categorize,
    pct_of_total,
)
from demo_bigdata_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
