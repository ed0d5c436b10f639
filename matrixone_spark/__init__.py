"""mospark — a PySpark-native analytics engine with MatrixOne's query surface.

Brand-new engine (NOT a port): the reference (matrixorigin/matrixone, read-only at
/root/reference) defines WHAT to compute — operator semantics, function surface,
test coverage — while everything here is idiomatic PySpark: DataFrame/SQL plans
optimized by Catalyst/AQE, Pandas UDFs only where built-ins can't express the
semantics.

Entry points:
    from matrixone_spark import Engine
    eng = Engine.local()                  # tuned local[N] session
    eng.load("/root/testdata/sf0.01")     # register parquet tables as views
    df = eng.sql("SELECT ...")
"""

from matrixone_spark.session import get_spark, SPARK_CONF
from matrixone_spark.catalog import Catalog, TABLES, load_tables
from matrixone_spark.engine import Engine

__all__ = ["get_spark", "SPARK_CONF", "Catalog", "TABLES", "load_tables", "Engine"]
__version__ = "0.1.0"
