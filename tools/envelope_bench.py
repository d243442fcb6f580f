#!/usr/bin/env python
"""Solo envelope-throughput benchmark -> ENVELOPE_BENCH.json.

The headline "envelope records/s" number (1M synthetic Kinesis-style
payloads through the full parse -> validate -> route chain, JVM-only,
noop-materialized) was measured IN the full bench sweep, at whatever
host load the sweep happened to hit: same-code driver readings swung
243k-1.56M rec/s across r7/r8 (r8 verdict item 2).  This tool is the
committed, reproducible form: its own fresh session, fixed warmup
runs that are never recorded, then min/median over N recorded runs,
written to ENVELOPE_BENCH.json next to BENCH_FULL.json so the
round-over-round delta reflects code, not measurement position.

The reference's envelope is the Kinesis platform ceiling: ~1,000
records/s/shard at the default 256 MB single-threaded Lambda worker
(reference README.md:33 throughput discussion, variables.tf:16-18
memory sizing); the JSON records that ceiling beside the measured
number so the comparison travels with the artifact.

Run:  python tools/envelope_bench.py [repeats] [warmup]
      (defaults: 5 recorded runs after 2 unrecorded warmups)
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

N_RECORDS = 1_000_000


def build_replay(spark):
    """The same synthetic payload stream bench.py replays: 8 log
    types, unique log_ids, parseable timestamps, a numeric field."""
    import pyspark.sql.functions as F

    payload = F.concat(
        F.lit('{"log_type":"t'),
        (F.col("id") % 8).cast("string"),
        F.lit('","log_id":"'),
        F.col("id").cast("string"),
        F.lit('","time":"2024-06-0'),
        (F.col("id") % 9 + 1).cast("string"),
        F.lit('T12:34:56Z","v":'),
        (F.col("id") % 1000).cast("string"),
        F.lit("}"),
    )
    return spark.range(N_RECORDS).select(payload.alias("payload"))


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    warmup = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from terraform_aws_lambda_kinesis_to_s3_spark.config import PipelineConfig
    from terraform_aws_lambda_kinesis_to_s3_spark.operators.envelope import (
        route_records,
    )
    from terraform_aws_lambda_kinesis_to_s3_spark.session import get_spark

    spark = get_spark()
    replay = build_replay(spark)
    cfg = PipelineConfig()

    def one_run() -> float:
        t0 = time.perf_counter()
        route_records(replay, cfg).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    for _ in range(warmup):
        one_run()
    runs = sorted(round(one_run(), 4) for _ in range(repeats))
    best, median = runs[0], runs[len(runs) // 2]

    from bench import (CALIB_ADMIT_MAX, calibration_admitted,  # noqa: F401
                   effective_calib_limits, host_calibration)

    calib = host_calibration(spark)
    admitted, admit_reasons = calibration_admitted(calib)
    out = {
        "metric": "envelope_records_per_sec",
        "value": round(N_RECORDS / best),
        "median_records_per_sec": round(N_RECORDS / median),
        "n_records": N_RECORDS,
        "runs_sec_sorted": runs,
        "repeats": repeats,
        "warmup_runs": warmup,
        "harness": (
            f"solo process, fresh session, local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}];"
            " full parse->validate->route chain, noop sink, no collect"
        ),
        "reference_ceiling_records_per_sec_per_shard": 1000,
        "reference_ceiling_note": (
            "Kinesis platform ingest ceiling per shard at the reference's "
            "default 256 MB single-threaded Lambda "
            "(reference README.md:33, variables.tf:16-18); the engine "
            "number is one local[32] process over the same logical chain"
        ),
        "host_calibration": calib,
        # self-certification (r10 verdict item 4): the same admission
        # window that gates BENCH_FULL gates this committed artifact
        "calibration_admission": {
            "admitted": admitted,
            "limits": effective_calib_limits(),
            "probes": calib,
            "reasons": admit_reasons,
        },
    }

    # A reading taken outside the calibration window must not touch the
    # committed artifact OR its series: it lands in the rejected
    # sidecar with its refusal reasons (the discarded 801k r10 attempt,
    # automated — previously a hand judgment).
    if not admitted:
        rej = os.path.join(_REPO, "ENVELOPE_BENCH_rejected.json")
        with open(rej, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
        print(
            f"CALIBRATION REFUSAL: {'; '.join(admit_reasons)} — reading "
            f"written to {rej}, committed artifact and series untouched; "
            "re-run in a quieter window",
            file=sys.stderr,
        )
        spark.stop()
        raise SystemExit(2)

    # Round-over-round SERIES (r9 verdict item 5): every run appends a
    # point carrying its own calibration block, so the trend is read
    # calibration-normalized — compare best×(jvm_calib/0.12 nominal),
    # never the raw number (a loaded window depresses the raw rec/s by
    # roughly its jvm inflation; the r10 pair demonstrates it).
    path = os.path.join(_REPO, "ENVELOPE_BENCH.json")
    series = []
    if os.path.exists(path):
        try:
            prior = json.load(open(path))
            series = prior.get("series", [])
            if not series:  # first artifact predates the series field
                series = [
                    {
                        "best_records_per_sec": prior["value"],
                        "median_records_per_sec": prior[
                            "median_records_per_sec"
                        ],
                        "host_calibration": prior.get("host_calibration"),
                    }
                ]
        except (OSError, ValueError, KeyError) as e:
            # ADVICE r10: a corrupt/schema-drifted prior artifact must
            # not SILENTLY reset the round-over-round series to one
            # point — make the reset visible in the run log.
            print(
                f"WARNING: prior {path} exists but could not be parsed "
                f"({type(e).__name__}: {e}) — series resets to this "
                "single point",
                file=sys.stderr,
            )
    series.append(
        {
            "best_records_per_sec": out["value"],
            "median_records_per_sec": out["median_records_per_sec"],
            "host_calibration": out["host_calibration"],
        }
    )
    out["series"] = series
    out["series_note"] = (
        "one point per recorded run, oldest first; normalize by each "
        "point's jvm_calib_sec against the ~0.12 s idle nominal before "
        "comparing — raw rec/s moves with host load, the normalized "
        "trend moves with code"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(
        f"wrote {path}: best {out['value']:,} rec/s "
        f"(median {out['median_records_per_sec']:,}; runs {runs}); "
        f"series now {len(series)} points"
    )
    spark.stop()


if __name__ == "__main__":
    main()
