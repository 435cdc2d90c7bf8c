"""Scalar functions: openGemini name → Spark Column expression.

Mirrors the Materialize-time registries (reference:
``lib/util/lifted/influx/query/math.go:21-132`` and
``query/string_functions.go:43-164``). Each entry is a thin wrapper over a
Catalyst built-in so expressions compile into whole-stage codegen; nothing
here drops to Python.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


# --- math (math.go) --------------------------------------------------------

def truncate(col, digits: int = 0) -> Column:
    """openGemini truncate: toward zero at the given decimal."""
    scale = 10 ** digits
    c = _c(col)
    return (
        F.when(c >= 0, F.floor(c * scale) / scale)
        .otherwise(-(F.floor(-c * scale) / scale))
    )


def row_max(*cols) -> Column:
    """row_max(a, b, …) — greatest across the row (math.go row_max)."""
    return F.greatest(*[_c(c) for c in cols])


def if_fn(cond: Column, then, otherwise) -> Column:
    """if(cond, a, b) (math.go if)."""
    return F.when(cond, then).otherwise(otherwise)


def clamp(col, lo, hi) -> Column:
    """clamp_prom: clip into [lo, hi]."""
    return F.least(F.greatest(_c(col), F.lit(lo)), F.lit(hi))


MATH_FNS = {
    "abs": F.abs, "sin": F.sin, "cos": F.cos, "tan": F.tan,
    "asin": F.asin, "acos": F.acos, "atan": F.atan, "atan2": F.atan2,
    "exp": F.exp, "ln": F.log, "log2": F.log2, "log10": F.log10,
    "sqrt": F.sqrt, "pow": F.pow, "floor": F.floor, "ceil": F.ceil,
    "round": F.round, "sgn": F.signum, "rad": F.radians, "deg": F.degrees,
    "sinh": F.sinh, "cosh": F.cosh, "tanh": F.tanh,
}


# --- string (string_functions.go) -----------------------------------------

def strlen(col) -> Column:
    return F.length(_c(col))


def substr(col, start: int, length: int | None = None) -> Column:
    c = _c(col)
    return F.substring(c, start, length) if length is not None else F.expr(
        f"substring({col}, {start})"
    )


def strpos(col, sub: str) -> Column:
    """1-based position of sub, 0 when absent (string_functions.go position)."""
    return F.instr(_c(col), sub)


def split_part(col, delim: str, n: int) -> Column:
    return F.expr(f"split_part({col}, '{delim}', {n})")


def split_to_map(col, entry_delim: str, kv_delim: str) -> Column:
    return F.expr(f"str_to_map({col}, '{entry_delim}', '{kv_delim}')")


def levenshtein_distance(a, b) -> Column:
    return F.levenshtein(_c(a), _c(b))


def regexp_extract(col, pattern: str, idx: int = 1) -> Column:
    return F.regexp_extract(_c(col), pattern, idx)


def regexp_like(col, pattern: str) -> Column:
    return _c(col).rlike(pattern)


def json_extract_scalar(col, path: str) -> Column:
    """json_extract_scalar(json, '$.k') (string_functions.go json_extract)."""
    return F.get_json_object(_c(col), path)


# --- url parts (string_functions.go url_extract_*) -------------------------
# Same regexes evaluate identically under Java regex and RE2, so the DuckDB
# oracle shares them (URL_PART_RE) instead of trusting either engine's
# parse_url.

URL_PART_RE = {
    "protocol": r"^([a-zA-Z][a-zA-Z0-9+.-]*):",
    "host": r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)",
    "port": r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*:([0-9]+)",
    "path": r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)",
    "query": r"\?([^#]*)",
    "fragment": r"#(.*)$",
}


def url_extract(col, part: str) -> Column:
    return F.regexp_extract(_c(col), URL_PART_RE[part], 1)


# --- prom time functions (prom_time_functions.go) --------------------------

def year_prom(ts) -> Column:
    return F.year(_c(ts)).cast("long")


def month_prom(ts) -> Column:
    return F.month(_c(ts)).cast("long")


def day_of_month_prom(ts) -> Column:
    return F.dayofmonth(_c(ts)).cast("long")


def day_of_week_prom(ts) -> Column:
    """Prometheus day_of_week: 0 = Sunday (Spark dayofweek is 1 = Sunday)."""
    return (F.dayofweek(_c(ts)) - 1).cast("long")


def day_of_year_prom(ts) -> Column:
    return F.dayofyear(_c(ts)).cast("long")


def hour_prom(ts) -> Column:
    return F.hour(_c(ts)).cast("long")


def minute_prom(ts) -> Column:
    return F.minute(_c(ts)).cast("long")


def days_in_month_prom(ts) -> Column:
    return F.dayofmonth(F.last_day(_c(ts))).cast("long")
