"""Parse stage: fetched page bytes → child URLs + typed item rows
(SURVEY §2.2 P1, §2.10 — the 16 ``parse_*`` callbacks re-expressed as ONE
vectorized ``mapInPandas`` pass over body bytes).

The reference parses with XPath per response (e.g. votings.py:160-216); the
synthetic site embeds the same structure (hrefs in ``<a href>``, the typed
record as a JSON ``<script id="payload">``, the member photo as
``<img id="photo">``), so extraction is vectorized pandas ``str`` ops over
Arrow batches — no per-row Python UDFs.

Outputs:
 - ``extract_children``: one row per (parent, child_idx, raw href) in
   DOCUMENT ORDER — the order Scrapy schedules children, which the LIFO pop
   must respect (child_idx is part of the frontier ``seq``);
 - ``extract_items``: one row per page with a payload: (url_hash, canon_url,
   kind, period_num, payload json, image_id).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame

HREF_RE = re.compile(r'<a href="([^"]*)"')
PAYLOAD_RE = re.compile(r'<script id="payload" type="application/json">(.*?)</script>', re.S)
IMG_RE = re.compile(r'<img id="photo" src="([^"]*)"')

CHILDREN_SCHEMA = (
    "parent_hash long, parent_seq long, parent_rank int, parent_depth int, "
    "child_idx int, href string"
)
ITEMS_SCHEMA = "url_hash long, canon_url string, payload string, image_id string"


def extract_children(fetched: DataFrame, rank_col: str = "rk") -> DataFrame:
    """fetched: (url_hash, canon_url, seq, depth, body, ...) → child hrefs in
    document order.  ``rank_col`` is carried through as ``parent_rank`` — the
    epoch loop passes its globally-unique pop ordinal (``grk``) so seq packing
    never aliases across hosts."""

    def _gen(batches):
        for pdf in batches:
            rows = {
                "parent_hash": [], "parent_seq": [], "parent_rank": [],
                "parent_depth": [], "child_idx": [], "href": [],
            }
            bodies = pdf["body"]
            for h, s, rk, d, body in zip(pdf["url_hash"], pdf["seq"], pdf[rank_col], pdf["depth"], bodies):
                if body is None:
                    continue
                text = bytes(body).decode("utf-8", errors="replace")
                for i, href in enumerate(HREF_RE.findall(text)):
                    rows["parent_hash"].append(h)
                    rows["parent_seq"].append(s)
                    rows["parent_rank"].append(rk)
                    rows["parent_depth"].append(d)
                    rows["child_idx"].append(i)
                    rows["href"].append(href)
            yield pd.DataFrame(rows)

    return fetched.select("url_hash", "seq", rank_col, "depth", "body").mapInPandas(_gen, schema=CHILDREN_SCHEMA)


def extract_items(fetched: DataFrame) -> DataFrame:
    """Pages whose body carries a typed payload → item rows."""

    def _gen(batches):
        for pdf in batches:
            out = {"url_hash": [], "canon_url": [], "payload": [], "image_id": []}
            for h, cu, body in zip(pdf["url_hash"], pdf["canon_url"], pdf["body"]):
                if body is None:
                    continue
                text = bytes(body).decode("utf-8", errors="replace")
                m = PAYLOAD_RE.search(text)
                if not m:
                    continue
                img = IMG_RE.search(text)
                out["url_hash"].append(h)
                out["canon_url"].append(cu)
                out["payload"].append(m.group(1))
                out["image_id"].append(img.group(1) if img else None)
            yield pd.DataFrame(out)

    return fetched.select("url_hash", "canon_url", "body").mapInPandas(_gen, schema=ITEMS_SCHEMA)
