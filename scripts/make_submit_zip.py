"""Package the engine for ``spark-submit --py-files`` (north_rule).

Builds ``dist/nrsr_crawler_spark.zip`` containing the package (no tests, no
fixtures).  Cluster usage:

    spark-submit \
        --py-files dist/nrsr_crawler_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        scripts/submit_crawl.py --lake s3://bucket/lake --seeds seeds.txt

The zip is import-order-safe: only ``nrsr_crawler_spark/**/*.py`` goes in.
"""

from __future__ import annotations

import pathlib
import zipfile

ROOT = pathlib.Path(__file__).resolve().parent.parent


def main() -> None:
    dist = ROOT / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "nrsr_crawler_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((ROOT / "nrsr_crawler_spark").rglob("*.py")):
            z.write(p, p.relative_to(ROOT))
    print(out)


if __name__ == "__main__":
    main()
