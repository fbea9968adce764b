from arrow_parquet_logs_spark.functions.hashing import hash64, hash64_sql, HASH64_SPARK_FMT, HASH64_DUCK_FMT
from arrow_parquet_logs_spark.functions.numeric import dec, dsum, davg
from arrow_parquet_logs_spark.functions.vector import cosine_sim, dot, l2_norm, as_double_array

__all__ = [
    "hash64",
    "hash64_sql",
    "HASH64_SPARK_FMT",
    "HASH64_DUCK_FMT",
    "dec",
    "dsum",
    "davg",
    "cosine_sim",
    "dot",
    "l2_norm",
    "as_double_array",
]
