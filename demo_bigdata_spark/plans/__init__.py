from demo_bigdata_spark.plans.inspect import (  # noqa: F401
    executed_plan,
    has_broadcast_join,
    has_cartesian,
    has_partition_filter,
    has_pushed_filters,
    wholestage_codegen_spans,
)
