from graphzeppelin_spark.streaming.driver import GraphStreamDriver  # noqa: F401
from graphzeppelin_spark.streaming.checkpoint import CheckpointStore  # noqa: F401
from graphzeppelin_spark.streaming.live import (  # noqa: F401
    LiveGraphStream,
    LivePagesStream,
)
from graphzeppelin_spark.streaming.windows import (  # noqa: F401
    StreamingDedup,
    streaming_exact_dedup,
    windowed_event_counts,
)
