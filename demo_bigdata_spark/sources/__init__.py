from demo_bigdata_spark.sources.catalog import (  # noqa: F401
    load_table,
    register_views,
    write_partitioned,
)
