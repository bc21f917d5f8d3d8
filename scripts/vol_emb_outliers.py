"""Scale measurement for op_emb_outliers (centroid-distance outliers).

Replicates the sf0.1 embeddings k times (vec_id offset per replica, a
deterministic per-replica scalar jiggle on one dimension so centroids
and distances stay non-degenerate) and times the registered plan at
1x / 100x / 1000x vectors.  The claim under test: one partial-aggregated
centroid pass + a broadcast join + a TakeOrdered top-k stays ~linear —
no stage shuffles the corpus by anything but `label`.

Usage: python scripts/vol_emb_outliers.py [k ...]
"""

import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from atlas_spark.operators.similarity import emb_outliers  # noqa: E402

SRC = "/root/testdata/sf0.1/embeddings.parquet"


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 100, 1000]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(SRC)
    n_base = base.count()
    for k in ks:
        import tempfile

        d = tempfile.mkdtemp()
        reps = [
            base.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                F.concat(
                    F.slice("embedding", 1, 63),
                    F.array(F.col("embedding")[63] + F.lit(i * 1e-4)),
                ).alias("embedding"),
                "label",
            )
            for i in range(k)
        ]
        df = reps[0]
        for r in reps[1:]:
            df = df.unionByName(r)
        df.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
        t0 = time.time()
        rows = emb_outliers(spark, d).collect()
        dt = time.time() - t0
        print(
            f"k={k:5d} vectors={n_base * k:9,d} time={dt:7.2f}s "
            f"top_dist={rows[0]['dist']:.4f} rows={len(rows)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
