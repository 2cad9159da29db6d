#!/usr/bin/env python3
"""Continuous-ingest pipeline on the engine — the reference's actual
deployment shape (doc_pipeline/services/document_processor.py:76-144:
the `_process_queue` worker loop — take a batch of submitted documents,
chunk, embed, index — repeated forever) re-expressed Spark-first as
Structured Streaming + foreachBatch.

This walkthrough drives the SAME path the driver-oracled
`streaming_search_e2e` registry key value-checks: documents replay as
three real micro-batches; each batch runs chunk → hash-embed →
frozen-codebook IVF cell assignment → vector-bearing append into the
cell-partitioned inverted file; a cosine top-k query then serves off
the streamed state with probe pruning.

Run:  python examples/streaming_ingest_pipeline.py [sf_dir]
Default: /root/testdata/sf0.01.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str):
    from data_pipeline2_spark import registry
    from data_pipeline2_spark.session import get_spark

    spark = get_spark("dp2s-streaming-ingest-example")
    spark.sparkContext.setLogLevel("ERROR")

    # the registry function IS the pipeline: fit codebook batch-side,
    # stream documents through the queue loop, serve off the streamed
    # inverted file (see registry/curation_r11.py:q_streaming_search_e2e)
    out = registry.queries()["streaming_search_e2e"](spark, sf_dir)
    rows = out.collect()

    print("top-k served off the STREAMED index (probe-pruned):")
    for r in rows:
        print(
            f"  #{r['rank']:>2}  vec {r['vec_id']:>20}  "
            f"cell={r['cell']}  score={r['score']:.6f}"
        )
    cells = sorted({r["cell"] for r in rows})
    print(
        f"\n{len(rows)} hits from {len(cells)} probed cell(s) {cells} — "
        "the scan read only those cells' files (partitionBy('cell') "
        "layout; see SCALE.md round 11 for the x10/x30 evidence)."
    )
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
