"""Adversarial fuzz sweep: JVM extraction ≡ Python kernel on a
deterministic randomly-composed corpus far wider than the fixtures —
severity needles mid-line and glued, malformed durations, kv needles at
string edges, quotes/commas/newlines inside csv fields, non-ASCII case
chars (Kelvin sign), continuation lines.

One Spark job over the whole corpus (hypothesis-per-example would pay a
Spark job per case); determinism via a fixed seed, so any mismatch is
reproducible by rid.
"""

import math
import random

import pytest
from pyspark.sql import functions as F

from pgweasel_spark import grammar as g
from pgweasel_spark.functions import extract as X

_TS = [
    "2025-05-22 15:15:09.392 EEST",
    "2025-05-21 11:00:40 UTC",
    "2025-13-40 99:99:99 XXX",  # record-start shaped, unparseable
    "2024-02-30 10:00:00 UTC",  # invalid calendar day
    "not a timestamp at all",
    "",
]

_BODY = [
    "[3239131] krl@postgres ",
    "ERROR:  boom ",
    "LOG:  checkpoint starting ",
    "FATAL:  password authentication failed ",
    "PANIC:  crash ",
    "DEBUG2:  noisy ",
    "WARNING:",  # needle without trailing space
    "error: lowercase needle ",  # must NOT match (case-sensitive scan)
    "duration: 4.053 ms ",
    "duration: 1.2.3 ms ",  # malformed float → no duration
    "duration:77us ",
    "duration: 5 s ",
    "duration: 250 ",  # unit missing
    "user=u1,",
    "user= ",
    "user=",
    'database=db"x ',
    "host=10.0.0.7 ",
    "host=",
    "application_name=app,x ",
    "deadlock detected ",
    "DeadLock Detected ",
    "process 12 acquired ",
    "PROCESS 12 ACQUIRED ",  # case-sensitive matcher must reject
    "Wait queue: 5 ",
    "recycled wal segment ",
    "K kelvin sign before lock ",  # Unicode lower('K')='k' trap
    "naïve café ",
    "statement: SELECT 1; ",
    ": ",
    '" quoted start ',
    "\n\tcontinuation line ",
    "\ncontext: deeper ",
    "no colon here ",
]


def _plain_record(rng: random.Random) -> str:
    parts = [rng.choice(_TS), " "]
    for _ in range(rng.randint(1, 6)):
        parts.append(rng.choice(_BODY))
    return "".join(parts)


def _csv_field(rng: random.Random) -> str:
    kind = rng.randint(0, 3)
    if kind == 0:
        return rng.choice(["simple", "12345", "", "ERROR", "x y z"])
    body = rng.choice(
        ['with "quotes"', "with, comma", "with\nnewline", "plain", ""]
    )
    return '"' + body.replace('"', '""') + '"'


def _csv_record(rng: random.Random) -> str:
    fields = [_csv_field(rng) for _ in range(26)]
    # plant a severity token in field 12 sometimes
    if rng.random() < 0.7:
        fields[11] = rng.choice(
            ["LOG", "ERROR", "FATAL", "WARNING", "PANIC", "notasev"]
        )
    return ",".join(fields)


@pytest.fixture(scope="module")
def fuzz_extracted(spark):
    rng = random.Random(20260816)
    rows = []
    for i in range(1500):
        rows.append((f"plain#{i}", "plain", _plain_record(rng)))
    for i in range(1500):
        rows.append((f"csv#{i}", "csv", _csv_record(rng)))
    df = spark.createDataFrame(rows, ["rid", "format", "raw"])
    raw, fmt = F.col("raw"), F.col("format")
    out = df.select(
        "rid",
        "format",
        "raw",
        X.severity(raw, fmt).alias("severity"),
        X.severity_num(X.severity(raw, fmt)).alias("severity_num"),
        X.message(raw, fmt).alias("message"),
        X.event_ts(raw).alias("event_ts"),
        X.duration_ms(raw).alias("duration_ms"),
        X.host(raw).alias("host"),
        X.user(raw).alias("user"),
        X.db(raw).alias("db"),
        X.appname(raw).alias("appname"),
        X.is_lock(raw).alias("is_lock"),
        X.is_system(raw).alias("is_system"),
    ).collect()
    return {r["rid"]: r for r in out}


def test_fuzz_severity(fuzz_extracted):
    for rid, row in fuzz_extracted.items():
        sev = (
            g.severity_csv(row["raw"])
            if row["format"] == "csv"
            else g.severity_plain(row["raw"])
        )
        assert row["severity"] == sev, f"{rid}: {row['raw']!r}"
        assert row["severity_num"] == g.severity_num(sev), rid


def test_fuzz_message(fuzz_extracted):
    for rid, row in fuzz_extracted.items():
        expected = g.message(row["raw"], row["format"])
        assert row["message"] == expected, (
            f"{rid}: jvm={row['message']!r} kernel={expected!r} "
            f"raw={row['raw']!r}"
        )


def test_fuzz_timestamp(fuzz_extracted):
    for rid, row in fuzz_extracted.items():
        expected = g.parse_timestamp(row["raw"])
        assert row["event_ts"] == expected, (
            f"{rid}: jvm={row['event_ts']} kernel={expected} "
            f"raw={row['raw']!r}"
        )


def test_fuzz_duration(fuzz_extracted):
    for rid, row in fuzz_extracted.items():
        expected = g.extract_duration_ms(row["raw"])
        got = row["duration_ms"]
        if expected is None:
            assert got is None, f"{rid}: jvm={got} raw={row['raw']!r}"
        else:
            assert got is not None and math.isclose(
                got, expected, rel_tol=1e-12
            ), f"{rid}: jvm={got} kernel={expected} raw={row['raw']!r}"


def test_fuzz_kv(fuzz_extracted):
    for rid, row in fuzz_extracted.items():
        for col, fn in [
            ("host", g.extract_host),
            ("user", g.extract_user),
            ("db", g.extract_db),
            ("appname", g.extract_appname),
        ]:
            expected = fn(row["raw"])
            assert row[col] == expected, (
                f"{rid}/{col}: jvm={row[col]!r} kernel={expected!r} "
                f"raw={row['raw']!r}"
            )


def test_fuzz_lock_system(fuzz_extracted):
    for rid, row in fuzz_extracted.items():
        assert row["is_lock"] == g.matches_lock(row["raw"]), (
            f"{rid}: raw={row['raw']!r}"
        )
        assert row["is_system"] == g.matches_system(row["raw"]), (
            f"{rid}: raw={row['raw']!r}"
        )
