from graphzeppelin_spark.functions.edges import (  # noqa: F401
    bidirect,
    canonicalize,
    degrees,
    live_edges_df,
    vertices_of,
)
