from graphzeppelin_spark.sketch.kernel import SketchGeometry, SketchMatrix  # noqa: F401
from graphzeppelin_spark.sketch.dsu import NumpyDSU  # noqa: F401
