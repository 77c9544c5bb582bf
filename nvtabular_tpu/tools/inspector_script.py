"""CLI: dataset statistics inspection (reference
nvtabular/tools/inspector_script.py — argparse driver; the CUDA-cluster/RMM
setup there is replaced by the in-process streaming engine).

Usage:
    python -m nvtabular_tpu.tools.inspector_script \
        --data_path /data/parquet --format parquet \
        --cat_names a,b --cont_names x,y --label_names label \
        --output_file stats.json
"""

from __future__ import annotations

import argparse
import json


def parse_args():
    p = argparse.ArgumentParser(description="Compute dataset statistics (JSON)")
    p.add_argument("-d", "--data_path", required=True, help="file/dir/glob of input data")
    p.add_argument("-f", "--format", choices=["csv", "parquet"], default="parquet")
    p.add_argument("--cat_names", default="", help="comma-separated categorical columns")
    p.add_argument("--cont_names", default="", help="comma-separated continuous columns")
    p.add_argument("--label_names", default="", help="comma-separated label columns")
    p.add_argument("-o", "--output_file", default="dataset_info.json")
    p.add_argument("--part_size", default=None, help="partition byte budget, e.g. 128MB")
    return p.parse_args()


def main():
    args = parse_args()
    import os
    import sys

    from ..io.dataset import Dataset
    from .dataset_inspector import DatasetInspector

    if not os.path.exists(args.data_path) and not any(c in args.data_path for c in "*?["):
        print(f"error: data path not found: {args.data_path}", file=sys.stderr)
        raise SystemExit(2)
    dataset = Dataset(args.data_path, engine=args.format, part_size=args.part_size)
    columns_dict = None
    if args.cat_names or args.cont_names or args.label_names:
        columns_dict = {
            "cats": [c for c in args.cat_names.split(",") if c],
            "conts": [c for c in args.cont_names.split(",") if c],
            "labels": [c for c in args.label_names.split(",") if c],
        }
    stats = DatasetInspector().inspect(dataset, columns_dict, output_file=args.output_file)
    print(json.dumps({"written": args.output_file, "num_rows": stats["num_rows"]}))


if __name__ == "__main__":
    main()
