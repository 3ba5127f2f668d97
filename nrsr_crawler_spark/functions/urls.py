"""URL kernel: canonicalization, fingerprinting, host sharding.

Spark-first re-expression of the reference's URL handling:
 - ``BASE_URL + relative`` joins   (/root/reference/nrsr/spiders/members.py:76)
 - ``urlparse``/``parse_qs`` id extraction (members.py:81-88, votings.py:164)
 - Scrapy dupefilter request fingerprint  (settings.py:114)

Two canon implementations with IDENTICAL semantics:
 - ``canonicalize`` — pure Column expressions (JVM, whole-stage codegen; the
   hot path).
 - ``canonicalize_py`` — plain-Python mirror used by the test-side reference
   simulator; parity asserted in tests/test_urls.py.

Canonical form: lowercase scheme + host, drop default port, path defaults to
``/``, query params sorted lexicographically (full-param strings), fragment
dropped.  Deterministic and idempotent: canon(canon(u)) == canon(u).

Scale note: everything here is a column expression over the frontier
DataFrame — no shuffle, no Python.  At 10^10 URLs this stage is pure map work
that scales linearly with executors.
"""

from __future__ import annotations

from urllib.parse import urlsplit

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_PORTS = {"http": 80, "https": 443}


def canonicalize(url: Column) -> Column:
    """Canonical URL as a Column expression (JVM-side)."""
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    # parse_url(HOST) strips the port; recover non-default ports from AUTHORITY
    port = F.regexp_extract(F.try_parse_url(url, F.lit("AUTHORITY")), r":(\d+)$", 1).try_cast("int")
    default_port = F.when(scheme == "http", F.lit(80)).when(scheme == "https", F.lit(443))
    host = F.when(
        port.isNotNull() & ~(port.eqNullSafe(default_port)),
        F.concat(host, F.lit(":"), port.cast("string")),
    ).otherwise(host)
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.try_parse_url(url, F.lit("QUERY"))
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(
            query.isNull() | (query == ""), F.lit("")
        ).otherwise(F.concat(F.lit("?"), sorted_query)),
    )


def canonicalize_py(url: str | None) -> str | None:
    """Plain-Python mirror of :func:`canonicalize` (simulator/tests only).

    Returns None for non-fetchable/malformed URLs (no scheme or no host) —
    the Spark expression yields NULL for those (host is NULL → concat NULL).
    """
    if not url:
        return None
    try:
        p = urlsplit(url)
    except ValueError:
        return None
    if not p.scheme or not p.hostname:
        return None
    scheme = p.scheme.lower()
    host = (p.hostname or "").lower()
    port = p.port
    if port is not None and DEFAULT_PORTS.get(scheme) != port:
        host = f"{host}:{port}"
    path = p.path or "/"
    out = f"{scheme}://{host}{path}"
    if p.query:
        out += "?" + "&".join(sorted(p.query.split("&")))
    return out


def url_hash(canon_url: Column) -> Column:
    """64-bit URL fingerprint (Spark-native dupefilter key, SURVEY §2.8 F14)."""
    return F.xxhash64(canon_url)


def url_host(url: Column) -> Column:
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def url_query_param(url: Column, key: str) -> Column:
    """``parse_qs(...)[key]`` equivalent (SURVEY §2.8 F9), e.g. ``ID``,
    ``CisObdobia``, ``PoslanecID`` (votings.py:164-165, members.py:86-88)."""
    return F.try_parse_url(url, F.lit("QUERY"), F.lit(key))


def url_query_param_long(url: Column, key: str) -> Column:
    return url_query_param(url, key).try_cast("long")


def resolve(base: str, href: Column) -> Column:
    """``'{}{}'.format(BASE_URL, href)`` (SURVEY §2.8 F10)."""
    return F.concat(F.lit(base), href)


def host_shard(host: Column, url_hash_col: Column, num_shards: int = 64, salt: int = 16) -> Column:
    """Salted host shard (north_star): spread a single dominant host
    (everything on www.nrsr.sk) across ``salt`` sub-shards while keeping
    shard→host many-to-one so per-host accounting stays exact.

    shard = xxhash64(host, url_hash % salt) mod num_shards — a pure map
    expression; this is what kills single-host shuffle skew at 10^10 URLs.
    """
    return F.pmod(F.xxhash64(host, F.pmod(url_hash_col, F.lit(salt))), F.lit(num_shards))
