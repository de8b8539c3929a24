"""Paired prev-vs-current noop timing for individual queries (r17).

Reuses bench.py's _package_from machinery: the BENCH_PREV_REF worktree's
package and the current repo's package run the SAME query interleaved
ABBA in ONE Spark session with the noop sink (guide §1.4), so host drift
cancels in the per-query ratio — the same methodology as bench.py's
paired phase, but with the noop sink (isolates computation from the
driver collect) and on-demand per query.

Usage: python tools/noop_pair_probe.py [--rounds=N] [--sf=DIR] name [name...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from tutorial_iceberg_spark.session import get_spark  # noqa: E402


def main() -> None:
    rounds = 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--rounds="):
            rounds = int(a.split("=", 1)[1])
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        else:
            names.append(a)
    spark = get_spark(app_name="noop-pair-probe")
    wt = bench._prev_worktree(REPO)
    assert wt, "prev worktree unavailable"
    roots = {"prev": wt, "cur": REPO}
    warm_sf = "/root/testdata/sf0.001"
    for name in names:
        times: dict[str, list[float]] = {"prev": [], "cur": []}
        for version in ("prev", "cur"):  # warm both sides
            with bench._package_from(roots[version]) as specs:
                specs[name].builder(spark, warm_sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                specs[name].builder(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
        for r in range(rounds):
            pattern = ("prev", "cur", "cur", "prev")
            if r % 2 == 1:
                pattern = tuple(reversed(pattern))
            for version in pattern:
                with bench._package_from(roots[version]) as specs:
                    spark.sparkContext.setJobDescription(
                        f"noop-pair:{name}:{version}:{r}"
                    )
                    t0 = time.perf_counter()
                    specs[name].builder(spark, sf_dir).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    times[version].append(time.perf_counter() - t0)
                    spark.sparkContext.setJobDescription(None)
        p = statistics.median(times["prev"])
        c = statistics.median(times["cur"])
        print(
            f"{name}: prev_median={p:.4f}s cur_median={c:.4f}s "
            f"ratio={c / p:.4f}  prev="
            + ",".join(f"{t:.3f}" for t in times["prev"])
            + "  cur="
            + ",".join(f"{t:.3f}" for t in times["cur"])
        )


if __name__ == "__main__":
    main()
