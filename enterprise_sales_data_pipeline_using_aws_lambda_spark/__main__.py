"""Command-line entry point.

    python -m enterprise_sales_data_pipeline_using_aws_lambda_spark \
        ingest <input-file-or-dir> --lake LAKE --warehouse WH --quarantine Q
    python -m enterprise_sales_data_pipeline_using_aws_lambda_spark \
        stream <raw-dir> --lake LAKE --warehouse WH --quarantine Q --checkpoint C

`ingest` runs one batch through the reference-shaped pipeline
(validate → lake → serving tables, ``pipeline.run_batch``) and prints
the status dict as JSON.  `stream` starts the checkpointed file-source
ingest (``streaming.pipeline.stream_sales_ingest``) and drains currently
available files (AvailableNow), giving replay-safe exactly-once sinks.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="enterprise_sales_data_pipeline_using_aws_lambda_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("ingest", "stream"):
        s = sub.add_parser(name)
        s.add_argument("input")
        s.add_argument("--lake", required=True)
        s.add_argument("--warehouse", required=True)
        s.add_argument("--quarantine", required=True)
        s.add_argument("--batch-summary", action="store_true",
                       help="reference-exact current-batch-only summary")
        if name == "stream":
            s.add_argument("--checkpoint", required=True)
    args = p.parse_args(argv)

    from .pipeline import PipelineConfig, run_batch
    from .session import get_spark

    cfg = PipelineConfig(
        lake_dir=args.lake,
        warehouse_dir=args.warehouse,
        quarantine_dir=args.quarantine,
        summary_scope="batch" if args.batch_summary else "cumulative",
    )
    spark = get_spark("sales-engine-cli")
    if args.cmd == "ingest":
        result = run_batch(spark, args.input, cfg)
        print(json.dumps(result))
        return 0 if result["status"] == "success" else 1
    from .streaming.pipeline import stream_sales_ingest

    q = stream_sales_ingest(
        spark, args.input, cfg, args.checkpoint, available_now=True
    )
    q.awaitTermination()
    print(json.dumps({"status": "success", "mode": "stream-available-now"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
