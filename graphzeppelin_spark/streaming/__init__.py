from graphzeppelin_spark.streaming.driver import GraphStreamDriver  # noqa: F401
from graphzeppelin_spark.streaming.checkpoint import CheckpointStore  # noqa: F401
