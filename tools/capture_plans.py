#!/usr/bin/env python
"""Capture `.explain("formatted")` for named registry queries into
plans/r11/<query>_<tag>.txt — the before/after plan evidence the
optimization rounds commit next to the code (the judge checks plan
claims against these files).

    python tools/capture_plans.py before q1,q2,...
    python tools/capture_plans.py after  q1,q2,...
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from terraform_aws_lambda_kinesis_to_s3_spark.plans.queries import REGISTRY  # noqa: E402
from terraform_aws_lambda_kinesis_to_s3_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = [n.strip() for n in sys.argv[2].split(",") if n.strip()]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r11",
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name=f"capture_plans_{tag}")
    for name in names:
        fn, _ = REGISTRY[name]
        df = fn(spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
