#!/usr/bin/env python3
"""CLI for the end-to-end training-dataset build — the LLM-data analogue
of the reference jobs' entry points: curate → chunk → pack → split over a
documents table, written as split-partitioned parquet plus a JSON
manifest (per-split chunk/doc/token counts).

    python bin/run_build_dataset.py --input_dir /root/testdata/sf0.01 \
        --output /tmp/dataset [--compact_records 5000000]

``--input_dir`` must contain documents.parquet (the testdata layout); the
build itself is plans/llm_data.py::corpus_build_dataset — the SAME
differential-tested query the driver verifies — so the CLI adds only
IO: a partitioned write (free split pruning for training readers) and
the manifest a data-loader consumes.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from test_flink_spark.config import PipelineConfig
from test_flink_spark.session import get_spark


def main(argv: list[str]) -> None:
    cfg = PipelineConfig.from_args(argv)
    in_dir = cfg.extra["input_dir"]
    out = cfg.extra["output"]
    spark = get_spark("build dataset job")

    from pyspark.sql import functions as F

    from test_flink_spark.plans.llm_data import corpus_build_dataset
    from test_flink_spark.sinks.files import write_parquet

    ds = corpus_build_dataset(spark, in_dir)
    write_parquet(
        ds,
        f"{out}/data",
        partition_by=("split",),
        max_records_per_file=int(cfg.extra.get("compact_records", 5_000_000)),
    )
    manifest = [
        r.asDict()
        for r in spark.read.parquet(f"{out}/data")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("n_chunk_tokens").alias("n_tokens"),
        )
        .orderBy("split")
        .collect()
    ]
    with open(f"{out}/manifest.json", "w") as f:
        json.dump({"input_dir": in_dir, "splits": manifest}, f, indent=2)
    print(json.dumps(manifest))


if __name__ == "__main__":
    main(sys.argv[1:])
