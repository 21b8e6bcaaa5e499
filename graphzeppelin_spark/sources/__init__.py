from graphzeppelin_spark.sources.generators import (  # noqa: F401
    dynamic_erdos_stream,
    kron_stream,
    multiples_graph_stream,
    pages_table,
    path_graph_stream,
)
from graphzeppelin_spark.sources.stream import (  # noqa: F401
    read_ascii_stream,
    read_binary_stream,
    write_ascii_stream,
    write_binary_stream,
)
from graphzeppelin_spark.sources.tables import read_table, write_bucketed  # noqa: F401
