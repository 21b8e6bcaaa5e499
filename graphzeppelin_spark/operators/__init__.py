from graphzeppelin_spark.operators.connectivity import connected_components_df  # noqa: F401
from graphzeppelin_spark.operators.pagerank import pagerank_df  # noqa: F401
from graphzeppelin_spark.operators.labelprop import label_propagation_df  # noqa: F401
from graphzeppelin_spark.operators.triangles import triangle_count_df, triangles_per_vertex_df  # noqa: F401
