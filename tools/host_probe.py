#!/usr/bin/env python
"""One-shot host-contention probe -> one JSON line.

Runs bench.host_calibration (single-thread md5 + 32-task xxhash
reduce, min-of-3 each) in a throwaway session and prints the dict.
Idle-host nominals observed r9: cpu ~0.03, jvm ~0.12 s; under heavy
co-tenant load jvm read 0.31-0.51 s while per-query floors inflated
1.4-2.1x.  Use before/after any timing comparison that matters:

    python tools/host_probe.py
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    from pyspark.sql import SparkSession

    from bench import host_calibration

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.range(1).write.format("noop").mode("overwrite").save()
    print(json.dumps(host_calibration(spark)))
    spark.stop()


if __name__ == "__main__":
    main()
