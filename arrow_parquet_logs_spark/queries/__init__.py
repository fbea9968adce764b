"""Import all query families so registration side effects populate REGISTRY."""

from arrow_parquet_logs_spark.queries import (  # noqa: F401
    events,
    geoq,
    graphq,
    multimodalq,
    reference,
    scalarq,
    textq,
    tpch,
    tpch_extra,
    vectorq,
)

from arrow_parquet_logs_spark.queries.catalog import (  # noqa: F401
    REGISTRY,
    all_oracles,
    all_queries,
    bench_queries,
    register,
)

__all__ = ["REGISTRY", "all_queries", "all_oracles", "bench_queries", "register"]
