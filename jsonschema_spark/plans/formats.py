"""`format` keyword checks (reference validator_strings.go:41-60
registry; implementations validator_format.go).

Each format compiles to a pure Column boolean — regex-first so the
whole check stays inside whole-stage codegen; no per-row Python.
Dialect note (SURVEY §7.4): Java regex (`rlike`) vs Go RE2 differ on
lookarounds/unicode classes; the patterns below stay in the common
subset.  Email/hostname are close approximations of Go's
mail.ParseAddress / regex (documented divergence for exotic inputs).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

FormatCheck = Callable[[Column], Column]
_FORMATS: dict[str, FormatCheck] = {}


def register_format(name: str):
    """AddFormatValidateFunc analog (validator_strings.go:62-64)."""

    def deco(fn: FormatCheck) -> FormatCheck:
        _FORMATS[name] = fn
        return fn

    return deco


def compile_format(name: str) -> FormatCheck:
    if name not in _FORMATS:
        raise ValueError(f"unknown format: {name}")
    return _FORMATS[name]


def known_formats() -> list[str]:
    return sorted(_FORMATS)


_RFC3339 = (
    r"^\d{4}-\d{2}-\d{2}[Tt ]\d{2}:\d{2}:\d{2}(\.\d+)?([Zz]|[+-]\d{2}:\d{2})?$"
)


@register_format("date-time")
def f_datetime(c: Column) -> Column:
    # RFC3339 parse (validator_format.go:62-67): shape + real parse
    return c.rlike(_RFC3339) & F.try_to_timestamp(
        F.regexp_replace(F.regexp_replace(c, r"[Tt]", " "), r"[Zz]$", "+00:00")
    ).isNotNull()


@register_format("date")
def f_date(c: Column) -> Column:
    return c.rlike(r"^\d{4}-\d{2}-\d{2}$") & F.try_to_timestamp(c, F.lit("yyyy-MM-dd")).isNotNull()


@register_format("time")
def f_time(c: Column) -> Column:
    return c.rlike(r"^\d{2}:\d{2}:\d{2}(\.\d+)?([Zz]|[+-]\d{2}:\d{2})?$")


_EMAIL = r"^[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)+$"


@register_format("email")
def f_email(c: Column) -> Column:
    return c.rlike(_EMAIL)


@register_format("idn-email")
def f_idn_email(c: Column) -> Column:
    return c.rlike(r"^[^@\s]+@[^@\s]+\.[^@\s]+$")


_HOSTNAME = r"^(([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]*[a-zA-Z0-9])\.)*([A-Za-z0-9]|[A-Za-z0-9][A-Za-z0-9\-]*[A-Za-z0-9])$"


@register_format("hostname")
def f_hostname(c: Column) -> Column:
    # same regex + len<=255 (validator_format.go:16, 98-103)
    return c.rlike(_HOSTNAME) & (F.length(c) <= 255)


@register_format("idn-hostname")
def f_idn_hostname(c: Column) -> Column:
    # disallowed-rune blacklist (validator_format.go:122-133)
    return (~c.rlike(r"[\s!@#$%^&*()+=\[\]{};:'\",/?<>\\|`~]")) & (F.length(c) <= 255) & (F.length(c) > 0)


_IPV4 = r"^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"


@register_format("ipv4")
def f_ipv4(c: Column) -> Column:
    return c.rlike(_IPV4)


@register_format("ipv6")
def f_ipv6(c: Column) -> Column:
    return c.contains(":") & c.rlike(r"^[0-9A-Fa-f:.]+$") & (
        F.length(c) - F.length(F.replace(c, F.lit(":"), F.lit(""))) >= 2
    )


@register_format("uri")
def f_uri(c: Column) -> Column:
    # url.Parse + scheme required (validator_format.go:247-261)
    return c.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:") & ~c.contains("\\")


@register_format("uri-reference")
def f_uri_ref(c: Column) -> Column:
    # no backslash (validator_format.go:165-174)
    return ~c.contains("\\")


@register_format("iri")
def f_iri(c: Column) -> Column:
    return f_uri(c)


@register_format("iri-reference")
def f_iri_ref(c: Column) -> Column:
    return f_uri_ref(c)


@register_format("uri-template")
def f_uri_template(c: Column) -> Column:
    # replace {...} then uri-reference (validator_format.go:262-269)
    return ~F.regexp_replace(c, r"\{[^}]*\}", "x").contains("\\")


@register_format("json-pointer")
def f_json_pointer(c: Column) -> Column:
    # tilde escape rules (validator_format.go:180-195)
    return (c == "") | (c.rlike(r"^(/([^~]|~[01])*)*$") & c.startswith("/")) | (c == "")


@register_format("relative-json-pointer")
def f_rel_json_pointer(c: Column) -> Column:
    return c.rlike(r"^(0|[1-9][0-9]*)(#|(/([^~]|~[01])*)*)$")


@register_format("regex")
def f_regex(c: Column) -> Column:
    # Go compiles under RE2 (validator_format.go:206-211); a full
    # compile check needs Python `re` — approximate: balanced-ish and
    # non-empty class/paren structure via a try of rlike against NULL
    # is impossible columnar; accept all but obviously broken ones.
    return ~c.rlike(r"(\((?:[^()]*\()*[^()]*$)|(\[[^\]]*$)|(\\$)")


@register_format("phone")
def f_phone(c: Column) -> Column:
    # len==11 && starts '1' (validator_format.go:285-291)
    return c.rlike(r"^1[0-9]{10}$")


# ------------------------------------------------- strict UDF variants
#
# The regex forms above stay in whole-stage codegen (the right default
# at 100 TB).  Where Go's semantics are a PARSER, not a regex
# (mail.ParseAddress, net.ParseIP, RE2-compile), the '-strict'
# variants below run the real Python parser as an Arrow-batched
# pandas UDF — the documented slow path (SURVEY §2.4): ~10-100x the
# cost of the regex, still vectorized batch transfer, never per-row
# py4j.  Use: {"format": "email-strict"}.

import pandas as pd  # noqa: E402  (type hints must resolve at module scope)


def _pandas_bool_udf(fn):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: False if v is None else bool(fn(v)))

    return udf


def _strict_email(v: str) -> bool:
    # Go mail.ParseAddress analog (validator_format.go:82-90)
    from email.utils import parseaddr

    name, addr = parseaddr(v)
    return addr != "" and "@" in addr and addr == v


def _strict_ipv4(v: str) -> bool:
    import ipaddress

    try:
        ipaddress.IPv4Address(v)
        return True
    except ValueError:
        return False


def _strict_ipv6(v: str) -> bool:
    import ipaddress

    try:
        ipaddress.IPv6Address(v)
        return ":" in v
    except ValueError:
        return False


def _strict_regex(v: str) -> bool:
    # 'compiles under RE2' (validator_format.go:206-211); python re is
    # a superset of RE2 for the common fixtures
    import re as _re

    try:
        _re.compile(v)
        return True
    except _re.error:
        return False


def _strict_uri(v: str) -> bool:
    from urllib.parse import urlparse

    try:
        p = urlparse(v)
        return bool(p.scheme) and "\\" not in v
    except ValueError:
        return False


def _lazy_udf_format(fn):
    """Build the pandas UDF on first use — constructing it needs an
    active SparkSession, which may not exist at import time."""
    holder: dict = {}

    def check(c):
        if "u" not in holder:
            holder["u"] = _pandas_bool_udf(fn)
        return holder["u"](c)

    return check


def register_strict_formats() -> None:
    """Register the '-strict' pandas-UDF formats (idempotent)."""
    for name, fn in [
        ("email-strict", _strict_email),
        ("ipv4-strict", _strict_ipv4),
        ("ipv6-strict", _strict_ipv6),
        ("regex-strict", _strict_regex),
        ("uri-strict", _strict_uri),
    ]:
        if name not in _FORMATS:
            _FORMATS[name] = _lazy_udf_format(fn)


register_strict_formats()
