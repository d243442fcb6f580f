"""Permissive timestamp parsing (reference parity: dateutil.parser.parse).

The reference accepts "anything dateutil accepts" for the envelope
``time`` field (``/root/reference/README.md:15``, dep
``python-dateutil==2.8.1`` at ``lambda/requirements.txt:6``).

Strategy (scale-first): a chain of JVM-side ``try_to_timestamp``
patterns covers ISO8601 and the common log formats with whole-stage
codegen; only rows that *fail* every JVM pattern reach the Arrow-batched
dateutil fallback, and they reach it as NULL-masked inputs so the UDF
does no Python work for the fast-path rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# JVM-side formats tried in order (Spark datetime patterns).
_JVM_FORMATS = (
    None,  # Spark's default ISO-ish parser: yyyy-MM-dd HH:mm:ss[.f][XXX] etc.
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy/MM/dd HH:mm:ss",
    "dd/MMM/yyyy:HH:mm:ss Z",  # CLF access-log style
    "yyyyMMdd'T'HHmmssX",
    "yyyy-MM-dd",
)


def _jvm_chain(col: Column) -> Column:
    branches = [
        F.try_to_timestamp(col) if fmt is None else F.try_to_timestamp(col, F.lit(fmt))
        for fmt in _JVM_FORMATS
    ]
    return F.coalesce(*branches)


def _require_dateutil() -> None:
    """Fail fast at plan-build time when the permissive fallback can't
    work: without this, records the reference would parse
    (``README.md:15``) silently come back NaT and route to ``unknown``
    with no signal."""
    import importlib.util

    if importlib.util.find_spec("dateutil") is None:
        raise RuntimeError(
            "permissive timestamp parsing requires python-dateutil on the "
            "driver and executors (reference parity: README.md:15, "
            "python-dateutil==2.8.1); install it or pass permissive=False"
        )


def _dateutil_fallback(col: Column) -> Column:
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("timestamp")
    def parse_dateutil(s: pd.Series) -> pd.Series:
        # Input is NULL-masked: fast-path rows arrive as NaN. Work only
        # on the (typically tiny) non-null slice so the kernel costs
        # ~nothing when every timestamp already parsed JVM-side.
        out = pd.Series(pd.NaT, index=s.index, dtype="datetime64[ns]")
        mask = s.notna()
        if not mask.any():
            return out
        try:
            from dateutil import parser as duparser
        except ImportError:
            # executors missing the dep is a deploy bug: fail the job
            # loudly instead of silently NaT-ing rows into 'unknown'
            raise RuntimeError(
                "python-dateutil is missing on this executor but "
                "permissive timestamp rows need it (deploy it with the "
                "job, e.g. --py-files / a conda env)"
            ) from None

        def one(v):
            try:
                return duparser.parse(v)
            except (ValueError, OverflowError, TypeError):
                return pd.NaT

        parsed = s[mask].map(one)
        # normalize tz-aware values to UTC-naive for Spark TimestampType
        out[mask] = pd.to_datetime(
            parsed, utc=True, errors="coerce"
        ).dt.tz_localize(None)
        return out

    return parse_dateutil(col)


def parse_timestamp(col: Column, permissive: bool = True) -> Column:
    """Parse a string timestamp column; NULL when unparseable.

    JVM format chain first; if ``permissive``, rows failing every JVM
    format are retried through dateutil (NULL-masked input so the Arrow
    kernel only does real work on the slow-path rows).
    """
    jvm = _jvm_chain(col)
    if not permissive:
        return jvm
    _require_dateutil()
    # Python UDFs are extracted into their own projection and run over
    # every row, so mask the input: fast-path rows enter as NULL.
    fallback = _dateutil_fallback(F.when(jvm.isNull() & col.isNotNull(), col))
    return F.coalesce(jvm, fallback)


def partition_date_cols(ts: Column, tz: str) -> tuple[Column, Column]:
    """(ym 'yyyy-MM', dd 'dd') partition keys in the configured timezone.

    Reference: S3 key layout ``%log_type%/YYYY-MM/DD/`` with TZ-shifted
    dates (``README.md:13``, ``main.tf:43``).
    """
    local = F.from_utc_timestamp(ts, tz) if tz and tz != "UTC" else ts
    return F.date_format(local, "yyyy-MM"), F.date_format(local, "dd")
