"""Byte-identity tests for the pure-Python grammar kernel.

Every assertion string below is taken from the reference's own inline unit
tests (cited per test) so the kernel is locked to the reference semantics
before any Spark code builds on it (SURVEY.md §5/§7).
"""

from datetime import datetime

import pytest

from pgweasel_spark import grammar as g

# --- record start (src/output_results/mod.rs:232-242) ----------------------


def test_record_start_azure():
    line = (
        "2025-05-21 11:01:20 UTC-682db26c.535-LOG:  disconnection: "
        "session time: 0:00:20.034 user=azuresu database=azure_maintenance "
        "host=127.0.0.1 port=55304"
    )
    assert g.is_record_start(line)


@pytest.mark.parametrize(
    "line,expected",
    [
        ("2025-05-22 15:15:09.392 EEST [1] LOG:  x", True),
        ("2025-05-21 11:00:10 UTC-682db23a.501-LOG:  y", True),
        ("\tUPDATE foo SET x = 1;", False),
        ("Help: https://docs.oracle.com/error-help/db/ora-01017/", False),
        ("", False),
        ("2025-05-22 15:15:09", False),  # len < 23
        ("x025-05-22 15:15:09.392 EEST", True),  # positional only — year not checked
    ],
)
def test_record_start_shapes(line, expected):
    assert g.is_record_start(line) is expected
    # the regex used for page splitting must agree with the positional test
    m = g.RECORD_START_RE.match(line)
    assert (m is not None and m.start() == 0) is expected


def test_split_records_basic():
    text = (
        "2025-05-22 15:15:09.392 EEST [1] ERROR:  boom\n"
        "2025-05-22 15:15:09.392 EEST [1] DETAIL:  detail here\n"
        "\tcontinuation line\n"
        "2025-05-22 15:15:10.000 EEST [1] LOG:  ok"
    )
    recs = g.split_records(text)
    assert len(recs) == 3
    # DETAIL line starts with a timestamp → its own record, with the
    # continuation attached (SURVEY.md §1.1)
    assert recs[1] == (
        "2025-05-22 15:15:09.392 EEST [1] DETAIL:  detail here\n"
        "\tcontinuation line\n"
    )
    # byte fidelity: records re-concatenate to the original text
    assert "".join(recs) == text


def test_split_records_preamble_and_empty():
    # lines before the first record-start form their own leading record
    text = "no timestamp here\n2025-05-22 15:15:09.392 EEST [1] LOG:  x\n"
    recs = g.split_records(text)
    assert recs == [
        "no timestamp here\n",
        "2025-05-22 15:15:09.392 EEST [1] LOG:  x\n",
    ]
    assert g.split_records("") == []
    assert g.split_records("just text") == ["just text"]


# --- severity (src/severity.rs:198-220) -------------------------------------


def test_severity_from_log_string():
    assert g.severity_plain("string ERROR: string") == "error"
    rec = (
        "2025-05-21 10:57:10.100 UTC [596]: [1-1] db=postgres,user=postgres,"
        'host=91.129.106.131 ERROR:  syntax error at or near "sdaasdasda" at '
        "character 12025-05-21 10:57:10.100 UTC [596]: [2-1] db=postgres,"
        "user=postgres,host=91.129.106.131 STATEMENT:  sdaasdasda"
    )
    assert g.severity_plain(rec) == "error"


def test_severity_from_csv_string():
    rec = (
        '"2025-05-08 12:24:37.731 EEST","krl","postgres",166063,'
        '"127.0.0.1:33584",681c7855.288af,1,"INSERT",'
        "2025-05-08 12:24:37 EEST,3/2,770,ERROR,23503,"
        '"insert or update on table "pgbench_accounts" violates foreign key '
        'constraint "pgbench_accounts_bid_fkey"","Key (bid)=(0) is not '
        'present in table "pgbench_branches".",,,,,'
        '"insert into pgbench_accounts select 0, 0, 0",,,"psql",'
        '"client backend",,0"'
    )
    assert g.severity_csv(rec) == "error"


def test_severity_precedence_quirk():
    # LOG: is tested before ERROR: (src/severity.rs:62-66) — replicated
    assert g.severity_plain("LOG:  something ERROR: nested") == "log"
    assert g.severity_plain("no needles at all") == "log"


def test_severity_ordinals():
    # src/severity.rs:161-176 incl. the Debug5|Panic→0 quirk
    assert g.severity_num("log") == 5
    assert g.severity_num("info") == 5
    assert g.severity_num("error") == 8
    assert g.severity_num("fatal") == 9
    assert g.severity_num("panic") == 0
    assert g.severity_num("debug5") == 0
    assert g.severity_num("debug4") == 1


# --- plain message (src/format/plain.rs:25-46) ------------------------------


def test_plain_message():
    line = "2025-01-01 UTC [1] ERROR: bad thing happened\nError details..."
    assert g.message_plain(line) == "bad thing happened"

    line = (
        "2025-08-27 17:35:28.619 EEST [275518] sitt@postgres FATAL:  "
        'password authentication failed for user "sitt"'
    )
    assert g.message_plain(line) == (
        'password authentication failed for user "sitt"'
    )

    line = (
        "2025-05-21 11:01:20 UTC-682db26c.535-LOG:  disconnection: session "
        "time: 0:00:20.034 user=azuresu database=azure_maintenance "
        "host=127.0.0.1 port=55304"
    )
    assert g.message_plain(line) == (
        "disconnection: session time: 0:00:20.034 user=azuresu "
        "database=azure_maintenance host=127.0.0.1 port=55304"
    )
    assert g.message_plain("no colon-space here") is None


# --- csv message (src/format/csv.rs:55-70) ----------------------------------


def test_csv_message():
    line = (
        "2025-12-01 01:56:57.080 EET,,,1637804,\"10.203.8.108:53096\","
        "692cd9c9.18fdac,1,\"\",2025-12-01 01:56:57 EET,,0,LOG,00000,"
        '"connection received: host=10.203.8.108 port=53096",,,,,,,,,"",'
        '"not initialized",,0\n'
    )
    assert g.message_csv(line) == (
        "connection received: host=10.203.8.108 port=53096"
    )


def test_csv_message_escaped_quotes_kept_verbatim():
    # strip_csv_quotes removes only the surrounding quotes; "" escapes stay
    line = ",".join(["f"] * 13) + ',"msg with ""quoted"" part",tail'
    assert g.message_csv(line) == 'msg with ""quoted"" part'


def test_csv_message_multiline_field():
    line = ",".join(["f"] * 13) + ',"line one\nline two",tail'
    assert g.message_csv(line) == "line one\nline two"
    assert g.extract_csv_field("a,b,c", 2) == "b"
    assert g.extract_csv_field("a,b,c", 5) is None
    assert g.extract_csv_field("a,b,c", 0) is None


# --- kv extraction (src/format/mod.rs:70-89) --------------------------------


def test_user_extract_after_csv():
    record = (
        '2025-12-01 08:50:20.071 EET,"binsy","binsy",1653291,'
        '"10.203.8.108:50372",692d3aac.193a2b,3,"authentication",'
        "2025-12-01 08:50:20 EET,104/121,0,LOG,00000,"
        '"connection authorized: user=binsy database=binsy",,,,,,,,,"",'
        '"client backend",,0'
    )
    assert g.extract_user(record) == "binsy"


def test_user_extract_after_log():
    record = (
        "2021-02-14 01:34:02 CET [30291]: db=template1,user=postgres,"
        "app=[unknown],client=[local] LOG:  connection authorized: "
        "user=postgres database=template1 application_name=psql"
    )
    assert g.extract_user(record) == "postgres"
    assert g.extract_db(record) == "template1"
    assert g.extract_appname(record) == "psql"
    assert g.extract_host(record) is None


def test_kv_first_char_unconditional():
    # the reference takes end = start+1 before scanning for delimiters, so
    # a delimiter immediately after the needle is swallowed into the value
    assert g.extract_after_needle("host=, rest", "host=") == ","
    # ...and the scan keeps consuming non-delimiters after it
    assert g.extract_after_needle("host= x", "host=") == " x"


# --- duration (src/duration.rs:56-73) ---------------------------------------


def test_duration_extract_from_csv():
    assert g.extract_duration_ms("Big text and duration: 121.997 ms more text") == (
        121.997
    )


def test_duration_extract_from_log():
    log = (
        "2025-05-21 11:00:40.296 UTC [675]: [3-1] db=postgres,"
        "user=cloudsqladmin,host=127.0.0.1 LOG:  duration: 3.032 ms  "
        "statement: SELECT extname, current_timestamp FROM "
        "pg_catalog.pg_extension"
    )
    assert g.extract_duration_ms(log) == 3.032


@pytest.mark.parametrize(
    "text,expected",
    [
        ("duration: 2722.543 ms", 2722.543),
        ("duration: 1 s", 1000.0),
        ("duration: 2 m", 120000.0),
        ("duration: 1500 us", 1.5),
        ("duration: 1999999 ns", 1.999999),
        ("duration: 121.9 us", 0.121),  # us truncates (as u64)
        ("duration: 5 parsecs", None),  # unknown unit
        ("duration: abc ms", None),  # no digits
        ("duration: 1.2.3 ms", None),  # f64 parse failure
        ("no duration here", None),
    ],
)
def test_duration_units(text, expected):
    got = g.extract_duration_ms(text)
    if expected is None:
        assert got is None
    else:
        assert got == pytest.approx(expected, rel=1e-12)


# --- timestamps (src/util.rs + output_results/mod.rs:171-179) ---------------


def test_parse_timestamp():
    rec = "2025-05-22 15:15:09.392 EEST [3239131] krl@postgres ERROR:  x"
    assert g.parse_timestamp(rec) == datetime(2025, 5, 22, 15, 15, 9, 392000)
    # azure: no milliseconds, third token is tz+session garbage
    rec = "2025-05-21 11:00:10 UTC-682db23a.501-LOG:  connection received:"
    assert g.parse_timestamp(rec) == datetime(2025, 5, 21, 11, 0, 10)
    # csvlog: third token is the comma-glued tail — consumed and ignored
    rec = "2025-05-08 12:24:37.731 EEST,\"krl\",\"postgres\",166063"
    assert g.parse_timestamp(rec) == datetime(2025, 5, 8, 12, 24, 37, 731000)
    # fewer than three tokens → quarantine (reference hard-aborts)
    assert g.parse_timestamp("2025-05-08 12:24:37.731") is None
    assert g.parse_timestamp("garbage tokens here") is None


# --- locking filter (src/filters/locking_filter.rs:85-97) -------------------


def test_matches_process_acquired():
    assert g.matches_lock("process 123 acquired")
    assert g.matches_lock("foo process 9 acquired bar")
    assert g.matches_lock("xprocess 1 acquired")
    assert not g.matches_lock("process acquired")
    assert not g.matches_lock("process  acquired")
    # the process-acquired matcher is case-SENSITIVE in the reference
    assert not g.matches_lock("PROCESS 123 ACQUIRED")


def test_lock_patterns():
    assert g.matches_lock("DEADLOCK DETECTED")  # AC literals case-insensitive
    assert g.matches_lock("process 3634117 still waiting for ShareLock")
    assert g.matches_lock("tuple to be locked was already moved: Wait queue: 1")
    assert not g.matches_lock("a perfectly normal statement")


# --- system filter (src/filters/system_filter.rs:60-91) ---------------------


@pytest.mark.parametrize(
    "text,expected",
    [
        ("autovacuum process started", True),
        ("Background writer is active", True),
        ("WAL segment created", True),
        ("Database system is starting up", True),
        ("Reloading configuration file", True),
        ("Creating extension pg_stat_statements", True),
        ('listening on IPv4 address "127.0.0.1", port 54316', True),
        ("This is a normal log message", False),
        ("User logged in successfully", False),
    ],
)
def test_system_filter(text, expected):
    assert g.matches_system(text) is expected


# --- connections vocabulary (src/aggregators/connections.rs:51-57) ----------


def test_connection_failure():
    assert g.connection_failure(
        'FATAL:  password authentication failed for user "x"', "fatal"
    )
    assert g.connection_failure(
        'FATAL:  role "y" is not permitted to log in', "fatal"
    )
    assert not g.connection_failure(
        "LOG:  password authentication failed", "log"
    )
    assert not g.connection_failure("FATAL:  out of memory", "fatal")


def test_kv_needle_at_end_of_record_is_none():
    # the reference PANICS on a needle at end-of-record (out-of-bounds
    # slice, src/format/mod.rs:56-64); both our layers yield no-value —
    # the fuzz sweep (test_fuzz_extract.py) pins kernel ≡ JVM here
    assert g.extract_after_needle("x host=", "host=") is None
