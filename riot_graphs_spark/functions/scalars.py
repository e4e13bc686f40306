"""Scalar function library (SURVEY §2.2).

Everything here except :func:`wrap_text` is a pure Catalyst expression —
JVM-side, codegen-friendly, no Python in the hot path. :func:`wrap_text` is
the reference's single genuinely UDF-shaped scalar (greedy word wrap,
reference ``riot_graphs/rg.py:364-366``) and is implemented as an
Arrow-batched pandas UDF.
"""

from __future__ import annotations

import textwrap

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def pr_number(msg: Column | str) -> Column:
    """P5 — first integer in a merge-commit subject → PR number.

    The reference does ``re.findall(r'\\d+', msg)[0]`` (``rg.py:78, 146``)
    which raises IndexError when the subject has no digits; this version is
    total — NULL instead (SURVEY §7 step 5 hardening).
    """
    extracted = F.regexp_extract(msg, r"(\d+)", 1)
    return F.nullif(extracted, F.lit("")).cast("long").alias("pr_num")


def html_pr_anchor(pr: Column | str, repo: str = "RIOT-OS/RIOT") -> Column:
    """P12 — Grafana annotation HTML anchor (reference ``rg.py:338-344``)."""
    pr = F.col(pr) if isinstance(pr, str) else pr
    return F.format_string(
        '<a target="_blank" href="https://github.com/%s/pull/%d">#%d</a>',
        F.lit(repo),
        pr,
        pr,
    )


@pandas_udf(StringType())
def _wrap32(s: pd.Series) -> pd.Series:
    return s.map(
        lambda text: None if text is None else "<br>".join(textwrap.wrap(text, 32))
    )


def wrap_text(col: Column | str) -> Column:
    """P13 — greedy word wrap at width 32, joined with ``<br>``
    (reference ``rg.py:364-366``). Arrow-batched pandas UDF: the only place
    the core engine leaves the JVM.
    """
    return _wrap32(F.col(col) if isinstance(col, str) else col)


def greedy_wrap(col: Column | str, width: int = 32, sep: str = "<br>") -> Column:
    """P13 (Catalyst form) — greedy word wrap as a pure ``aggregate`` fold
    over the token array: no Python, whole-stage codegen, oracle-portable
    (DuckDB ``list_reduce`` folds identically left-to-right).

    Matches ``textwrap.wrap(s, width)`` for inputs whose words are all
    ≤ width chars (the reference's PR-title case, ``rg.py:364-366``);
    over-long words stay unbroken on their own line instead of being split.
    Use :func:`wrap_text` (pandas UDF) when exact textwrap semantics for
    pathological words matter.
    """
    c = F.col(col) if isinstance(col, str) else col
    tokens = F.split(F.trim(c), r"\s+")
    last_line = lambda acc: F.element_at(F.split(acc, "\n"), -1)  # noqa: E731
    folded = F.aggregate(
        tokens,
        F.lit(""),
        lambda acc, w: F.when(acc == "", w)
        .when(
            F.length(last_line(acc)) + F.length(w) + 1 <= width,
            F.concat(acc, F.lit(" "), w),
        )
        .otherwise(F.concat(acc, F.lit("\n"), w)),
    )
    return F.regexp_replace(folded, "\n", sep)


def parse_iso_offset(col: Column | str) -> Column:
    """P6 — parse ``%Y-%m-%d %H:%M:%S %z`` git-log dates (reference ``rg.py:220``).

    ``try_to_timestamp``: total under ANSI mode — malformed dates yield NULL
    (the reference's strptime raises; SURVEY §7 step 5 hardening)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit("yyyy-MM-dd HH:mm:ss Z"))


def parse_rfc2822(col: Column | str) -> Column:
    """P7 — parse RFC-2822 ``Last-Modified`` headers.

    The reference builds ``datetime(*eut.parsedate(h)[:7])`` (``rg.py:101``),
    which stuffs the weekday into the microsecond argument and drops the
    timezone; this is correct by construction instead (SURVEY §2.2 P7).

    The redundant weekday prefix is stripped before parsing: Spark ≥3's
    datetime parser rejects ``EEE`` as a *parse* pattern (day-of-week is
    derived, not consumed), and RFC 2822 marks it optional anyway.
    """
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"^[A-Za-z]{3},\s*", "")
    return F.try_to_timestamp(stripped, F.lit("dd MMM yyyy HH:mm:ss zzz"))


def anchored_day(ts: Column | str, anchor_hours: int = 3) -> Column:
    """P8/O3 — bucket a timestamp into its 03:00-UTC-anchored day.

    The reference anchors nightly windows at 03:00 UTC (``rg.py:61-68``).
    Returns the bucket *start* timestamp: ``date_trunc(day, ts - anchor) + anchor``.
    Equivalent to ``window(ts, '1 day', startTime='3 hours').start`` but a plain
    scalar expression, so it is usable as a join/group key and stays portable
    to the SQL oracle.
    """
    ts = F.col(ts) if isinstance(ts, str) else ts
    shifted = F.date_trunc("DAY", ts - F.expr(f"INTERVAL {anchor_hours} HOURS"))
    return shifted + F.expr(f"INTERVAL {anchor_hours} HOURS")


def normalize_url(url: Column | str) -> Column:
    """Canonicalize a URL for dedup keying (the C4/RefinedWeb-style URL
    normalization pass): lowercase (dedup canonical form, not a display
    form), strip the fragment, fold ``http``→``https``, strip leading
    ``www.`` and the default ``:443`` port, remove tracking query params
    (``utm_*``, ``fbclid``, ``gclid``, ``ref``) repairing the leading
    ``?``/``&`` structure, and strip any trailing ``?``/``&``/``/``.

    Pure anchored-regex chain — whole-stage-codegen row-local, zero
    Python, and portable to the RE2-based SQL oracle (no lookaround, no
    backreferences in patterns). Param *sorting* is a documented non-goal
    (needs a higher-order split/sort; tracking-param removal plus exact
    key equality covers the dedup contract).
    """
    u = F.col(url) if isinstance(url, str) else url
    u = F.lower(u)
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, r"^http://", "https://")
    u = F.regexp_replace(u, r"^https://www\.", "https://")
    u = F.regexp_replace(u, r"^(https://[^/:]+):443/", "$1/")
    u = F.regexp_replace(u, r"^(https://[^/:]+):443$", "$1")
    u = F.regexp_replace(
        u, r"[?&](utm_[a-z0-9]+|fbclid|gclid|ref)=[^&#]*", ""
    )
    # If the surviving first param lost its '?' (a tracking param led the
    # query string), promote the first '&' back to '?'.
    u = F.regexp_replace(u, r"^([^?&]*)&", "$1?")
    u = F.regexp_replace(u, r"[?&]+$", "")
    u = F.regexp_replace(u, r"/+$", "")
    return u


def registered_domain(url_norm: Column | str) -> Column:
    """Registrable domain of a :func:`normalize_url`-canonicalized URL:
    host minus subdomains, with a small built-in two-level public-suffix
    set (``co.uk``-class); hosts without a dot pass through. A full
    public-suffix list would be a broadcast lookup join — the regex form
    keeps the common cases row-local and oracle-portable.
    """
    u = F.col(url_norm) if isinstance(url_norm, str) else url_norm
    host = F.regexp_extract(u, r"^https://([^/:?#]+)", 1)
    reg3 = F.regexp_extract(
        host,
        r"([^.]+\.(?:co|com|org|net|ac|gov)\.(?:uk|au|jp|br|in))$",
        1,
    )
    reg2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return (
        F.when(reg3 != "", reg3)
        .when(reg2 != "", reg2)
        .otherwise(host)
    )
