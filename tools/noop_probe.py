"""Isolated per-query timing with the noop sink (optimization guide §1.4).

Times each named query's full computation (every column of every row) via
``df.write.format("noop")`` — no collect(), no result materialization on the
driver — with job descriptions set so the timing is attributable.

Usage: python tools/noop_probe.py [--runs=N] [--sf=DIR] name [name ...]
Prints one line per query: name, best, all runs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tutorial_iceberg_spark.registry import all_queries  # noqa: E402
from tutorial_iceberg_spark.session import get_spark  # noqa: E402


def main() -> None:
    runs = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        else:
            names.append(a)
    spark = get_spark(app_name="noop-probe")
    specs = all_queries()
    warm_sf = "/root/testdata/sf0.001"
    for name in names:
        b = specs[name].builder
        # warm codegen/JIT at the smallest SF, then one untimed run at the
        # probe SF to absorb the cold-cache penalty (bench.py convention)
        try:
            b(spark, warm_sf).write.format("noop").mode("overwrite").save()
            b(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"{name}: WARM FAILED {e}")
            continue
        samples = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"noop:{name}:{i}")
            t0 = time.perf_counter()
            b(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: best={min(samples):.4f}s runs="
            + ",".join(f"{s:.4f}" for s in samples)
        )


if __name__ == "__main__":
    main()
