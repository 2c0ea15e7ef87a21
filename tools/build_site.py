#!/usr/bin/env python3
"""One-command stats-site build (the reference's plot.sh end artifact):

    python tools/build_site.py [sf_dir] [out_dir]

One corpus pass → data/*.csv for all 14 figures, percentage HTML
tables, PNG renders when matplotlib is installed, and
_site_manifest.json (the golden bundle contract,
tests/test_site_build.py). Defaults: /root/testdata/sf0.001 → ./site.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "site"
    from cc_crawl_statistics_spark.session import get_spark
    from cc_crawl_statistics_spark.sources.site import build_site

    spark = get_spark()
    manifest = build_site(spark, sf_dir, out_dir)
    print(json.dumps({
        "out_dir": out_dir,
        "n_files": len(manifest["files"]),
        "n_rendered": len(manifest["rendered"]),
    }))


if __name__ == "__main__":
    main()
