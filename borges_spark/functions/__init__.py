from borges_spark.functions.urls import (  # noqa: F401
    canonicalize_url_col,
    canonicalize_url_py,
    url_hash_col,
    url_host_col,
)
