from graphzeppelin_spark.sources.generators import (  # noqa: F401
    dynamic_erdos_stream,
    kron_stream,
    multiples_graph_stream,
    pages_table,
    path_graph_stream,
)
