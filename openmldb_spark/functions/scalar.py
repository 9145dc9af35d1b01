"""Scalar function surface — OpenMLDB built-ins as Catalyst expressions.

Reference registrations: hybridse/src/udf/default_udf_library.cc (line
numbers per SURVEY.md §2.7); documented surface:
docs/en/reference/sql/functions_and_operators/Files/udfs_8h.md.

Every function returns a Column built purely from pyspark.sql.functions —
JVM-side, whole-stage codegen, no Python in the data path. Names that
collide with Python builtins keep the OpenMLDB name (``pow``, ``round``)
but are only exported via ``SCALARS``.

Divergences (documented, none feature-vector-relevant):
- ``farm_fingerprint`` → xxhash64 (different hash family, stable).
- ``hash64`` → xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    if isinstance(x, Column):
        return x
    if isinstance(x, str):
        return F.col(x)
    return F.lit(x)


# -- null handling (default_udf_library.cc is_null/if_null/nvl/nvl2) ---------

def is_null(c) -> Column:
    return F.isnull(_c(c))


def if_null(c, default) -> Column:
    return F.coalesce(_c(c), _c(default))


nvl = if_null


def nvl2(c, not_null_val, null_val) -> Column:
    return F.when(_c(c).isNotNull(), _c(not_null_val)).otherwise(_c(null_val))


# -- math (registration lines: SURVEY.md §2.7) -------------------------------

def inc(c) -> Column:
    return _c(c) + 1


def identity(c) -> Column:
    return _c(c)


def maximum(a, b) -> Column:
    """Element-wise max of two columns (→ greatest)."""
    return F.greatest(_c(a), _c(b))


def minimum(a, b) -> Column:
    return F.least(_c(a), _c(b))


def pmod(a, b) -> Column:
    return F.pmod(_c(a), _c(b))


def truncate(c) -> Column:
    """Truncate toward zero (udfs_8h.md truncate)."""
    col = _c(c)
    return F.when(col >= 0, F.floor(col)).otherwise(F.ceil(col)).cast("double")


def hash64(c) -> Column:
    return F.xxhash64(_c(c))


farm_fingerprint = hash64


def log_(base, c=None) -> Column:
    if c is None:
        return F.log(_c(base))
    return F.log(float(base), _c(c)) if isinstance(base, (int, float)) \
        else F.log(_c(base), _c(c))


# -- string (concat :692, concat_ws :719, substring :749, strcmp :808,
#    upper :1118, lower :1133, reverse :1148, char :1165, char_length :1179,
#    replace :1193, hex :592, like_match :859, regexp_like :1023) -----------

def strcmp(a, b) -> Column:
    a, b = _c(a), _c(b)
    # NULL input -> NULL result (the SQL-path template sql.py has no
    # ELSE branch for the same reason); .otherwise(0) alone would call
    # NULL == anything "equal"
    return (F.when(a.isNull() | b.isNull(), F.lit(None))
            .when(a < b, -1).when(a > b, 1).otherwise(0)
            .cast("int"))


def char_(code) -> Column:
    return F.char(_c(code))


def char_length(c) -> Column:
    return F.length(_c(c))


def like_match(s, pattern, escape="\\") -> Column:
    # route str patterns through F.like too: Column.like has no escape
    # parameter, so a custom escape char would be silently ignored
    # depending on the Python type of the pattern argument
    return F.like(_c(s), _c(pattern) if not isinstance(pattern, str)
                  else F.lit(pattern), F.lit(escape))


def ilike_match(s, pattern) -> Column:
    return F.upper(_c(s)).like(pattern.upper()) if isinstance(pattern, str) \
        else F.ilike(_c(s), _c(pattern))


def regexp_like(s, pattern) -> Column:
    return F.regexp_like(_c(s), _c(pattern))


def fz_join(arr, sep) -> Column:
    """join/fz_join: concat list elements (feature_zero_def.cc)."""
    return F.array_join(_c(arr), sep)


def fz_split(s, sep) -> Column:
    # split of NULL is the EMPTY list in the reference
    # (feature_zero_def.cc; same coalesce as the SQL-path template)
    return F.coalesce(F.split(_c(s), sep),
                      F.array().cast("array<string>"))


def split_by_key(s, item_sep, kv_sep) -> Column:
    """Split "k1:v1,k2:v2" → list of keys (feature_zero_def.cc)."""
    return F.map_keys(F.str_to_map(_c(s), F.lit(item_sep), F.lit(kv_sep)))


def split_by_value(s, item_sep, kv_sep) -> Column:
    return F.map_values(F.str_to_map(_c(s), F.lit(item_sep), F.lit(kv_sep)))


# -- date / time (µs-aware; OpenMLDB computes on int64 ms — SURVEY §1.2) ----

def dayofweek(c) -> Column:
    """1 = Sunday (matches both OpenMLDB and Spark)."""
    return F.dayofweek(_c(c))


def week(c) -> Column:
    return F.weekofyear(_c(c))


def datediff(end, start) -> Column:
    return F.datediff(_c(end), _c(start))


def last_day(c) -> Column:
    return F.last_day(_c(c))


def unix_timestamp_(c) -> Column:
    return F.unix_timestamp(_c(c))


def timestamp_ms(ms) -> Column:
    """int64 ms → timestamp (OpenMLDB ``timestamp(bigint)``)."""
    return F.timestamp_millis(_c(ms))


def add_(a, b) -> Column:
    """OpenMLDB ``add(a, b)`` = a + b (udfs_8h.md)."""
    return _c(a) + _c(b)


def split_array(s, sep) -> Column:
    """``split_array(str, delim)`` -> array<string>; NULL -> empty array
    (reference default_defs/array_def.cc semantics, matching fz_split)."""
    return fz_split(s, sep)


# -- registry: OpenMLDB name → builder --------------------------------------
# One entry per documented scalar (udfs_8h.md); value is either a pyspark
# function used directly or a wrapper above.

SCALARS = {
    # math
    "abs": F.abs, "acos": F.acos, "asin": F.asin, "atan": F.atan,
    "atan2": F.atan2, "cos": F.cos, "cot": F.cot, "sin": F.sin,
    "tan": F.tan, "exp": F.exp, "ln": F.log, "log": log_, "log2": F.log2,
    "log10": F.log10, "sqrt": F.sqrt, "pow": F.pow, "power": F.pow,
    "pmod": pmod, "round": F.round, "floor": F.floor, "ceil": F.ceil,
    "ceiling": F.ceil, "truncate": truncate, "degrees": F.degrees,
    "radians": F.radians, "inc": inc, "identity": identity,
    "maximum": maximum, "minimum": minimum, "hash64": hash64,
    "farm_fingerprint": farm_fingerprint, "add": add_,
    # string
    "concat": F.concat, "concat_ws": F.concat_ws, "substring": F.substring,
    "substr": F.substring, "strcmp": strcmp, "lower": F.lower,
    "lcase": F.lower, "upper": F.upper, "ucase": F.upper,
    "reverse": F.reverse, "char": char_, "char_length": char_length,
    "character_length": char_length, "replace": F.replace, "hex": F.hex,
    "unhex": F.unhex, "like_match": like_match, "ilike_match": ilike_match,
    "regexp_like": regexp_like,
    "join": fz_join, "fz_join": fz_join, "split": fz_split,
    "fz_split": fz_split, "split_by_key": split_by_key,
    "split_by_value": split_by_value,
    # array (reference default_defs/array_def.cc)
    "array_contains": F.array_contains, "split_array": split_array,
    "size": F.size,
    # date / time
    "year": F.year, "month": F.month, "day": F.dayofmonth,
    "dayofmonth": F.dayofmonth, "dayofweek": dayofweek,
    "dayofyear": F.dayofyear, "week": week, "weekofyear": F.weekofyear,
    "hour": F.hour, "minute": F.minute, "second": F.second,
    "date": F.to_date, "date_format": F.date_format, "datediff": datediff,
    "last_day": last_day, "unix_timestamp": unix_timestamp_,
    "timestamp": timestamp_ms,
    # null handling
    "is_null": is_null, "isnull": is_null, "if_null": if_null,
    "ifnull": if_null, "nvl": nvl, "nvl2": nvl2,
}


def fn(name: str):
    """Look up an OpenMLDB scalar by its SQL name."""
    try:
        return SCALARS[name]
    except KeyError:
        raise ValueError(f"unknown OpenMLDB scalar {name!r}") from None
