import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N = int(sys.argv[1])
spark = (
    SparkSession.builder.master(f"local[{N}]")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
df = spark.range(0, 40_000_000, 1, N * 4)
expr = F.sum(F.bit_count(F.xxhash64(F.sha2(F.col("id").cast("string"), 256))).cast("long"))
df.select(expr).collect()
t0 = time.time()
df.select(expr).collect()
print(N, "cores:", round(time.time() - t0, 2), "s")
