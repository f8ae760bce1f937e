"""Pure-Python reference kernel for the pgweasel log grammar.

This module is the single source of truth for the reference semantics
(kmoppel/pgweasel, Rust, read-only at /root/reference). Every function here
replicates byte-for-byte the behavior of the cited reference routine and is
locked by tests/test_grammar.py against the reference's own inline-test
strings. The Spark layer (pgweasel_spark.functions.extract) re-expresses the
same semantics as JVM-side Column expressions; tests assert the two layers
agree on every record of every reference fixture.

No code is copied from the reference — each function is a re-derivation of
the documented semantics (see SURVEY.md §2 for the operator inventory).
"""

from __future__ import annotations

import re
from datetime import datetime

# ---------------------------------------------------------------------------
# Severity (reference: src/severity.rs)
# ---------------------------------------------------------------------------

#: Needle precedence for plain/stderr records (src/severity.rs:62-101).
#: Order matters: the reference tests ``LOG:`` before ``ERROR:`` — a record
#: containing both classifies as ``log``. We replicate the exact order.
SEVERITY_ORDER = [
    "LOG",
    "ERROR",
    "INFO",
    "NOTICE",
    "WARNING",
    "DEBUG5",
    "DEBUG4",
    "DEBUG3",
    "DEBUG2",
    "DEBUG1",
    "FATAL",
    "PANIC",
]

#: severity → ordinal (src/severity.rs:161-176). Quirks preserved:
#: LOG and INFO share 5; DEBUG5 and PANIC map to 0 (so PANIC records are
#: invisible above min-severity 0 — documented reference defect, replicated
#: because per-sink count equality depends on it).
SEVERITY_NUM = {
    "debug5": 0,
    "debug4": 1,
    "debug3": 2,
    "debug2": 3,
    "debug1": 4,
    "log": 5,
    "info": 5,
    "notice": 6,
    "warning": 7,
    "error": 8,
    "fatal": 9,
    "panic": 0,
}

#: Enrichment classes for the dim_severity broadcast table (ours, not the
#: reference's — the reference has no class column).
SEVERITY_CLASS = {
    "debug5": "debug",
    "debug4": "debug",
    "debug3": "debug",
    "debug2": "debug",
    "debug1": "debug",
    "log": "info",
    "info": "info",
    "notice": "info",
    "warning": "warning",
    "error": "error",
    "fatal": "error",
    "panic": "error",
}


def severity_plain(record: str) -> str:
    """First-match-wins substring scan, ``src/severity.rs:62-101``."""
    for name in SEVERITY_ORDER:
        if f"{name}:" in record:
            return name.lower()
    return "log"


def severity_csv(record: str) -> str:
    """Same scan with ``,SEV,`` needles, ``src/severity.rs:20-58``."""
    for name in SEVERITY_ORDER:
        if f",{name}," in record:
            return name.lower()
    return "log"


def severity_num(severity: str) -> int:
    """Ordinal lookup, ``src/severity.rs:161-176``."""
    return SEVERITY_NUM[severity]


def severity_from_name(name: str) -> str:
    """CLI string → severity, case-insensitive, unknown → info
    (``src/severity.rs:179-196``)."""
    up = name.upper()
    if up in SEVERITY_ORDER and up != "INFO":
        return up.lower()
    return "info"


# ---------------------------------------------------------------------------
# Record splitting (reference: src/output_results/mod.rs:95-121, 221-230)
# ---------------------------------------------------------------------------

#: Positional record-start test as a multiline regex. A line is a record
#: start iff len >= 23 and b[4]=='-', b[7]=='-', b[10]==' ', b[13]==':',
#: b[16]==':', b[19] in {'.', ' '} (``src/output_results/mod.rs:221-230``).
#: ``.`` never matches newline, so the whole shape stays on one line; the
#: trailing ``.{3}`` enforces len >= 23.
RECORD_START_RE = re.compile(
    r"(?m)^.{4}-.{2}-.{2} .{2}:.{2}:.{2}[. ].{3}"
)


def is_record_start(line: str) -> bool:
    """Positional timestamp-shape test, ``src/output_results/mod.rs:221-230``."""
    return (
        len(line) >= 23
        and line[4] == "-"
        and line[7] == "-"
        and line[10] == " "
        and line[13] == ":"
        and line[16] == ":"
        and (line[19] == "." or line[19] == " ")
    )


def split_records(text: str) -> list[str]:
    """Split a page's text into records, ``src/output_results/mod.rs:95-121``.

    A record spans from one record-start line up to (exclusive) the next
    record-start line. Lines before the first record-start form their own
    leading record (the reference emits ``slice[0..offset]`` at the first
    start line when ``offset != 0``). Every record keeps its trailing
    newline except possibly the last — raw bytes are preserved exactly.
    """
    if not text:
        return []
    starts = [m.start() for m in RECORD_START_RE.finditer(text)]
    if not starts:
        return [text]
    if starts[0] != 0:
        starts = [0] + starts
    bounds = starts + [len(text)]
    return [text[bounds[i]: bounds[i + 1]] for i in range(len(bounds) - 1)]


# ---------------------------------------------------------------------------
# Message extraction (reference: src/format/plain.rs, src/format/csv.rs)
# ---------------------------------------------------------------------------


def message_plain(record: str) -> str | None:
    """Text after the first ``": "``, then skip further spaces, cut at the
    first newline (``src/format/plain.rs:1-23``)."""
    i = record.find(": ")
    if i == -1:
        return None
    j = i + 1
    n = len(record)
    while j < n and record[j] == " ":
        j += 1
    end = record.find("\n", j)
    if end == -1:
        end = n
    return record[j:end]


def extract_csv_field(record: str, field_index: int) -> str | None:
    """1-based CSV field extraction honoring quotes and ``""`` escapes,
    without unescaping (``src/format/csv.rs:7-53``). Surrounding quotes are
    stripped only when both first and last char are quotes."""
    if field_index == 0:
        return None
    in_quotes = False
    current = 1
    field_start = 0
    i = 0
    n = len(record)
    while i < n:
        c = record[i]
        if c == '"':
            if in_quotes and i + 1 < n and record[i + 1] == '"':
                i += 1  # escaped quote stays verbatim
            else:
                in_quotes = not in_quotes
        elif c == "," and not in_quotes:
            if current == field_index:
                return _strip_csv_quotes(record[field_start:i])
            current += 1
            field_start = i + 1
        i += 1
    if current == field_index:
        return _strip_csv_quotes(record[field_start:])
    return None


def _strip_csv_quotes(field: str) -> str:
    if len(field) >= 2 and field[0] == '"' and field[-1] == '"':
        return field[1:-1]
    return field


def message_csv(record: str) -> str | None:
    """csvlog field 14 = message (``src/format/csv.rs:1-3``)."""
    return extract_csv_field(record, 14)


def message(record: str, fmt: str) -> str | None:
    """Format dispatch (``src/format/mod.rs:30-35``)."""
    return message_csv(record) if fmt == "csv" else message_plain(record)


# ---------------------------------------------------------------------------
# Timestamp (reference: src/util.rs:171-200 + output_results/mod.rs:171-179)
# ---------------------------------------------------------------------------


def parse_timestamp(record: str) -> datetime | None:
    """Join the record's first three whitespace tokens and parse
    ``YYYY-MM-DD HH:MM:SS[.fff]``; the third token (TZ abbreviation or
    csvlog tail) must exist but is discarded (``src/util.rs:171-200``,
    call site ``src/output_results/mod.rs:171-178``).

    The reference aborts the whole run on parse failure; we return None and
    route the record to a quarantine sink instead (SURVEY.md §4).
    """
    parts = record.split()
    if len(parts) < 3:
        return None
    ts = f"{parts[0]} {parts[1]}"
    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S"):
        try:
            return datetime.strptime(ts, fmt)
        except ValueError:
            continue
    return None


# ---------------------------------------------------------------------------
# Key-value extraction (reference: src/format/mod.rs:37-68)
# ---------------------------------------------------------------------------


def extract_after_needle(record: str, needle: str) -> str | None:
    """Value after the first ``needle`` occurrence, terminated by space,
    comma or double-quote. The reference takes at least one character
    unconditionally (``end = start + 1`` before the scan loop,
    ``src/format/mod.rs:53-68``) — replicated."""
    pos = record.find(needle)
    if pos == -1:
        return None
    start = pos + len(needle)
    if start >= len(record):
        # degenerate: needle at end of record. The REFERENCE PANICS here
        # (end = start+1 then &record[start..end] slices out of bounds,
        # src/format/mod.rs:56-64); we yield no-value instead, matching
        # the JVM expression (regex requires >= 1 char after the needle).
        return None
    end = start + 1
    n = len(record)
    while end < n and record[end] not in (" ", ",", '"'):
        end += 1
    return record[start:end]


def extract_host(record: str) -> str | None:
    return extract_after_needle(record, "host=")


def extract_user(record: str) -> str | None:
    return extract_after_needle(record, "user=")


def extract_db(record: str) -> str | None:
    return extract_after_needle(record, "database=")


def extract_appname(record: str) -> str | None:
    return extract_after_needle(record, "application_name=")


# ---------------------------------------------------------------------------
# Duration extraction (reference: src/duration.rs)
# ---------------------------------------------------------------------------

_DURATION_RE = re.compile(r"duration: *([0-9.]+) *([A-Za-z]*)")

#: unit → milliseconds multiplier; ns/us truncate the value to an integer
#: first, mirroring ``Duration::from_nanos(v as u64)`` /
#: ``from_micros(v as u64)`` (``src/duration.rs:43-54``).
_UNIT_TRUNCATING = {"ns": 1e-6, "us": 1e-3}
_UNIT_FLOAT = {"ms": 1.0, "s": 1e3, "m": 6e4, "min": 6e4, "minutes": 6e4}


def extract_duration_ms(record: str) -> float | None:
    """``duration:`` + spaces + ``[0-9.]+`` + spaces + alphabetic unit,
    first occurrence only (``src/duration.rs:5-41``). Unknown unit or
    unparseable number → None."""
    m = _DURATION_RE.search(record)
    if m is None:
        return None
    num, unit = m.group(1), m.group(2)
    try:
        v = float(num)
    except ValueError:
        return None
    if unit in _UNIT_TRUNCATING:
        return int(v) * _UNIT_TRUNCATING[unit]
    if unit in _UNIT_FLOAT:
        return v * _UNIT_FLOAT[unit]
    return None


# ---------------------------------------------------------------------------
# Locks / system pattern vocabularies
# (reference: src/filters/locking_filter.rs, src/filters/system_filter.rs)
# ---------------------------------------------------------------------------

#: 17 case-insensitive literals (``src/filters/locking_filter.rs:12-30``).
LOCK_PATTERNS = [
    " conflicts ",
    " conflicting ",
    " still waiting for ",
    "Wait queue:",
    "while locking tuple",
    "while updating tuple",
    "conflict detected",
    "deadlock detected",
    "buffer deadlock",
    "blocked by process ",
    "recovery conflict ",
    " concurrent update",
    "could not serialize",
    "could not obtain ",
    "lock on relation ",
    "cannot lock rows",
    " semaphore:",
]

#: 24 case-insensitive literals (``src/filters/system_filter.rs:12-43``).
SYSTEM_PATTERNS = [
    "autovacuum",
    "checkpointer",
    "background writer",
    "bgwriter",
    "wal",
    "replication",
    "logical replication",
    "replication slot",
    "walreceiver",
    "walsender",
    "archiver",
    "starting PostgreSQL",
    "database system is starting",
    "database system is ready",
    "database system is shutting down",
    "startup process",
    "shut down",
    "listening on ",
    "reloading configuration",
    "configuration file",
    "SIGHUP",
    "extension",
    "shared_preload_libraries",
    "CREATE EXTENSION",
]

#: Hand-rolled ``process [0-9]+ acquired`` matcher — case-SENSITIVE in the
#: reference (byte-literal prefix/suffix, ``locking_filter.rs:51-83``),
#: unlike the Aho-Corasick literals which are case-insensitive.
_PROCESS_ACQUIRED_RE = re.compile(r"process [0-9]+ acquired")

#: re.ASCII keeps (?i) folding ASCII-only, matching the reference's
#: ``ascii_case_insensitive`` Aho-Corasick builder (locking_filter.rs:81,
#: system_filter.rs:46) and Java's default (?i) folding in the Spark-side
#: rlike (extract.is_lock/is_system) — Java needs UNICODE_CASE for
#: anything beyond ASCII, which we never enable.
_LOCK_RE = re.compile(
    "(?i:" + "|".join(re.escape(p) for p in LOCK_PATTERNS) + ")", re.ASCII
)
_SYSTEM_RE = re.compile(
    "(?i:" + "|".join(re.escape(p) for p in SYSTEM_PATTERNS) + ")", re.ASCII
)


def lock_regex() -> str:
    """Single alternation equivalent to LockingFilter (AC literals,
    case-insensitive) OR the case-sensitive process-acquired matcher.
    Valid in Python re, Java regex and RE2."""
    lits = "|".join(re.escape(p) for p in LOCK_PATTERNS)
    return f"(?i:{lits})|process [0-9]+ acquired"


def system_regex() -> str:
    lits = "|".join(re.escape(p) for p in SYSTEM_PATTERNS)
    return f"(?i:{lits})"


def matches_lock(record: str) -> bool:
    """LockingFilter.matches (``locking_filter.rs:41-49``)."""
    return bool(_LOCK_RE.search(record)) or bool(
        _PROCESS_ACQUIRED_RE.search(record)
    )


def matches_system(record: str) -> bool:
    """SystemFilter.matches (``system_filter.rs:54-58``)."""
    return bool(_SYSTEM_RE.search(record))


# ---------------------------------------------------------------------------
# Connection-message vocabulary (reference: src/aggregators/connections.rs)
# ---------------------------------------------------------------------------

CONN_RECEIVED_PREFIX = "connection received:"
CONN_AUTHORIZED_PREFIX = "connection authorized:"
CONN_SSL_NEEDLE = "SSL enabled"
CONN_FAILURE_NEEDLES = (
    "password authentication failed",
    "is not permitted to log in",
)


def connection_failure(record: str, severity: str) -> bool:
    """FATAL + failure needle → connection failure
    (``connections.rs:51-57``)."""
    return severity == "fatal" and any(
        n in record for n in CONN_FAILURE_NEEDLES
    )
