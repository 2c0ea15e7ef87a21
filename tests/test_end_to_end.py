"""The self-hosting chain (tools/end_to_end_demo.py) as a CI gate:
pages → WARC+CDX → CDX ingest → stats wire → curation → shards, every
cross-stage invariant asserted inside main()."""

from __future__ import annotations


def test_end_to_end_demo_chain(spark):
    from tools.end_to_end_demo import main

    main(spark)  # raises on any stage invariant breach
